"""Generic map_reduce API — wordcount-style jobs mirroring the reference's
mapper/reducer surface (program.c:184-222, 415-445)."""

from __future__ import annotations

from emulating_hadoop_with_mpi_spark.mapreduce import map_reduce, map_reduce_by_key


def test_map_reduce_wordcount(spark):
    lines = spark.sparkContext.parallelize(["a b a", "b c", "a"], 2)

    def mapper(line):
        return [(w, 1) for w in line.split()]

    def reducer(k, values):
        yield (k, sum(values))

    out = dict(map_reduce(lines, mapper, reducer).collect())
    assert out == {"a": 3, "b": 2, "c": 1}


def test_map_reduce_with_combiner(spark):
    lines = spark.sparkContext.parallelize(["x x y", "x y y y"], 2)

    def mapper(line):
        return [(w, 1) for w in line.split()]

    def combiner(k, values):
        yield (k, sum(values))

    def reducer(k, values):
        yield (k, sum(values))

    out = dict(map_reduce(lines, mapper, reducer, combiner=combiner).collect())
    assert out == {"x": 3, "y": 4}


def test_map_reduce_by_key_matches_grouped_path(spark):
    data = spark.sparkContext.parallelize(range(100), 4)

    def mapper(x):
        yield (x % 7, x)

    def reducer(k, values):
        yield (k, sum(values))

    slow = dict(map_reduce(data, mapper, reducer).collect())
    fast = dict(map_reduce_by_key(data, mapper, lambda a, b: a + b).collect())
    assert slow == fast
