"""JSON parse-path equivalence for the events table.

q52 used to run BOTH JVM parse paths per benchmark (from_json typed
struct AND get_json_object path extraction) to pin their equivalence;
round 10 moved the production query to a single from_json parse
(measured ~35% faster at sf0.1) and the equivalence pin here.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from emulating_hadoop_with_mpi_spark.sources.tables import load_table


def test_json_parse_paths_agree(spark, sf_dir):
    """from_json into a typed struct and get_json_object('$.k') must
    decode the same value for every event row — including rows where the
    key is absent (both yield NULL)."""
    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    both = ev.select(
        F.from_json("props", schema)["k"].alias("k_struct"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
    )
    diverged = both.filter(
        ~(
            (F.col("k_struct") == F.col("k_path"))
            | (F.col("k_struct").isNull() & F.col("k_path").isNull())
        )
    )
    assert diverged.count() == 0, diverged.limit(5).collect()
    # and the dataset exercises the non-null path
    assert both.filter(F.col("k_struct").isNotNull()).count() > 0
