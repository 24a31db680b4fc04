"""SparkSession factory.

One place to encode the session defaults the engine relies on:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast selection) — the modern replacement for the reference's
  hand-rolled static splits (``program.c:143-181, 378-413``).
- Arrow-backed Python↔JVM transfer for the few Pandas-UDF code paths.
- UTC session timezone so timestamp semantics line up with the DuckDB
  oracle (both treat the driver tables' timestamps as naive/UTC).
- ``spark.sql.legacy.parquet.nanosAsLong`` — the driver's ``events.ts`` is
  parquet TIMESTAMP(NANOS); Spark has no nanosecond timestamp type, so we
  read it as a long and convert to microseconds in the loader
  (DuckDB likewise truncates ns → µs, keeping the oracle aligned).

Tests and bench run on ``local[N]``; on a real cluster the same builder is
used with master/deploy settings supplied by spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "emulating-hadoop-with-mpi-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; under
    spark-submit on a cluster, leave it None and let submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
