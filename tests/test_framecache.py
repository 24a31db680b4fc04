"""PlanKeyedFrameCache (functions/framecache.py — round 14, VERDICT r13
item 4 generalized): bounded operator-internal persists with warm reuse.
The ranged/pack/curate registries are instances; this file pins the
class contract itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.functions.framecache import (
    PlanKeyedFrameCache,
)


def _frame(spark, salt: str):
    return spark.range(0, 50).select(
        "id", F.md5(F.concat(F.col("id").cast("string"), F.lit(salt))).alias("h")
    )


def test_identical_plan_reuses_registered_frame(spark):
    cache = PlanKeyedFrameCache(capacity=2)
    a = cache.lookup(_frame(spark, "x"))
    b = cache.lookup(_frame(spark, "x"))
    assert b is a  # plan-identical -> the registered twin, not a new entry
    assert len(cache) == 1
    cache.release_all()


def test_capacity_bounds_storage(spark):
    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    cache = PlanKeyedFrameCache(capacity=2)
    for salt in "abcde":
        cache.lookup(_frame(spark, salt)).count()
        assert len(cache) <= 2
        assert jsc.getPersistentRDDs().size() <= base + 2
    cache.release_all()
    assert len(cache) == 0
    assert jsc.getPersistentRDDs().size() <= base


def test_hit_revives_externally_cleared_cache(spark):
    """spark.catalog.clearCache() drops the backing data of every entry;
    a registry hit must re-persist, not hand back a dead frame that
    recomputes on every traversal."""
    cache = PlanKeyedFrameCache(capacity=2)
    a = cache.lookup(_frame(spark, "z"))
    a.count()
    assert a.storageLevel.useMemory or a.storageLevel.useDisk
    spark.catalog.clearCache()
    lvl = a.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)  # dead after the clear
    b = cache.lookup(_frame(spark, "z"))
    assert b is a
    lvl = b.storageLevel
    assert lvl.useMemory or lvl.useDisk  # revived by the hit
    cache.release_all()


def test_rejects_nonpositive_capacity(spark):
    with pytest.raises(ValueError):
        PlanKeyedFrameCache(capacity=0)
