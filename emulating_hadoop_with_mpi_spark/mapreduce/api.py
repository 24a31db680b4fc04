"""Generic MapReduce surface over RDD[(K, V)].

The reference's whole "API" is two hardwired functions —
``mapperFunction`` (``program.c:184-222``), a flatMap that emits (key, value)
string pairs into a linked list (``list.c:21-32``), and ``reducerFunction``
(``program.c:415-445``), a per-key aggregate over the grouped value list —
wired together by a hand-built shuffle (gather-to-master + rebroadcast,
``program.c:224-296``) and a serial group-by-key (``performCombiner``,
``program.c:298-311``).

Here the same job shape is a three-liner: ``flatMap`` → shuffle (Spark's
hash-partitioned Exchange replaces the O(cluster×data) full-replication
gather) → ``groupByKey``/``reduceByKey`` → flatMap of the reducer.

Scale notes:
- ``map_reduce`` is the faithful Hadoop shape (reducer sees the full value
  iterable).  Like Hadoop, it shuffles every value — fine when value lists
  are bounded, wrong tool for giant hot keys.
- ``map_reduce_by_key`` is the scalable shape for associative reducers:
  ``reduceByKey`` gets map-side partial aggregation (a *real* combiner —
  the reference's ``performCombiner`` despite its name only groups, it
  never pre-aggregates).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any, TypeVar

from pyspark import RDD

K = TypeVar("K")
V = TypeVar("V")
R = TypeVar("R")

Mapper = Callable[[Any], Iterable[tuple[K, V]]]
Reducer = Callable[[K, Iterable[V]], Iterable[tuple[K, R]]]
Combiner = Callable[[K, Iterable[V]], Iterable[tuple[K, V]]]


def _apply_combiner_per_partition(pairs: RDD, combiner: Combiner) -> RDD:
    """Hadoop-style combiner: group within each map partition, run the
    combiner locally, emit its pairs.  Cuts shuffle volume before the
    Exchange — the optimization the reference lacks entirely."""

    def run(part: Iterable[tuple[K, V]]) -> Iterable[tuple[K, V]]:
        groups: dict[K, list[V]] = {}
        for k, v in part:
            groups.setdefault(k, []).append(v)
        for k, vs in groups.items():
            yield from combiner(k, vs)

    return pairs.mapPartitions(run, preservesPartitioning=False)


def map_reduce(
    rdd: RDD,
    mapper: Mapper,
    reducer: Reducer,
    combiner: Combiner | None = None,
    num_partitions: int | None = None,
) -> RDD:
    """Full Hadoop dataflow: flatMap → [combine] → shuffle+group → reduce.

    ``mapper(record)`` yields (k, v) pairs; ``reducer(k, values)`` yields
    output (k, r) pairs.  Unlike the reference (``program.c:427-436``),
    reducers must NOT rely on value order within a key — Spark's shuffle
    gives no ordering guarantee (SURVEY §2 note 1).
    """
    pairs = rdd.flatMap(mapper)
    if combiner is not None:
        pairs = _apply_combiner_per_partition(pairs, combiner)
    grouped = pairs.groupByKey(numPartitions=num_partitions)
    return grouped.flatMap(lambda kv: reducer(kv[0], kv[1]))


def map_reduce_by_key(
    rdd: RDD,
    mapper: Mapper,
    merge: Callable[[V, V], V],
    num_partitions: int | None = None,
) -> RDD:
    """Scalable path for associative/commutative reduction: map-side combine
    via ``reduceByKey`` — shuffles one partial per (partition, key) instead
    of every emitted value."""
    return rdd.flatMap(mapper).reduceByKey(merge, numPartitions=num_partitions)
