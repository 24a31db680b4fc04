"""Jar-present integration leg for the Kafka seam (VERDICT r6 item 5).

`streaming/events.py:kafka_events_stream` is the one events_source()
branch no test drives: the spark-sql-kafka connector jar is not baked
into this container.  This test attempts to RESOLVE the jar at run time
(spark.jars.packages → Maven/Ivy, needs network) in a SUBPROCESS — jar
config must be set before the JVM starts, so the shared session fixture
can't be reused.  With the jar present it builds the Kafka source through
the factory and asserts the full parse+normalize seam yields the events
contract schema on a real connector plan (no broker needed: Kafka
connects at query start, not at plan build).  Offline, it skips with the
environment reason recorded.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

_PROBE = r"""
import sys
sys.path.insert(0, {repo!r})
import pyspark
from pyspark.sql import SparkSession

scala = "2.13"
pkg = f"org.apache.spark:spark-sql-kafka-0-10_{{scala}}:{{pyspark.__version__}}"
spark = (
    SparkSession.builder.master("local[2]")
    .appName("kafka-jar-probe")
    .config("spark.jars.packages", pkg)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from emulating_hadoop_with_mpi_spark.streaming.events import events_source

# No broker: .load() builds the source plan without connecting (Kafka
# connects at stream START).  This exercises the real connector's source
# relation + our from_json parse + the ts-normalization seam.
df = events_source(spark, kind="kafka", brokers="localhost:19092", topic="events")
assert df.isStreaming, "kafka source must be a streaming DataFrame"
got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
want = [
    ("event_id", "bigint"),
    ("ts", "timestamp"),
    ("user_id", "bigint"),
    ("event_type", "string"),
    ("value", "double"),
    ("props", "string"),
]
assert got == want, f"schema through the kafka seam: {{got}}"
print("KAFKA_SEAM_OK")
spark.stop()
"""


def test_kafka_source_through_seam_with_resolved_jar():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE.format(repo=repo)],
            capture_output=True,
            text=True,
            timeout=240,
        )
    except subprocess.TimeoutExpired:
        pytest.skip(
            "kafka connector jar resolution timed out (no network to Maven "
            "Central in this container) — seam stays covered by the "
            "replay/parquet branches"
        )
    out = proc.stdout + proc.stderr
    if proc.returncode != 0:
        if any(
            s in out
            for s in (
                "unresolved dependency",
                "UnknownHostException",
                "Connection refused",
                "Network is unreachable",
                "RESOLUTION FAILED",
                "not resolved",
            )
        ):
            pytest.skip(
                "kafka connector jar could not be resolved (offline "
                "container): " + out.strip().splitlines()[-1][:200]
            )
        raise AssertionError(f"kafka seam probe failed for a non-network reason:\n{out[-3000:]}")
    assert "KAFKA_SEAM_OK" in out
