"""Skew-handling utilities.

The reference's answer to load imbalance is a random 60/40 role split and
contiguous row ranges with the remainder dumped on the last worker
(``program.c:122-135, 154-157``) — a hot key melts one rank.  Spark gives
two real tools:

- AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on in
  session.py): oversized shuffle partitions are split at runtime.  This is
  the default answer.
- Explicit SALTING, below, for when the skew is known and extreme (one key
  holding >> a partition's worth): replicate the small side R ways, spread
  the big side's hot keys across R sub-keys, join on (key, salt).

``salted_join`` is semantics-preserving for inner equi-joins — proven
against the plain join in tests/test_skew.py on a deliberately skewed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for heavy-hitter group keys: partial-aggregate
    on (key, salt) — spreading a hot key over `salt` shuffle partitions —
    then final-aggregate on the key.  Valid for the decomposable aggregates
    named in ``agg_exprs`` ({output_col: 'sum'|'count'|'min'|'max'}).

    Spark's own HashAggregate already does map-side partials; this helps
    when a SINGLE reducer key still exceeds a partition (the reference's
    worst case: its contiguous key ranges put entire hot rows on one rank,
    ``program.c:378-413``).  Equality with the plain groupBy is tested in
    tests/test_skew.py."""
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    partial_exprs = []
    final_exprs = []
    for out, how in agg_exprs.items():
        src = F.col(out)
        if how == "sum":
            partial_exprs.append(F.sum(out).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif how == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif how == "min":
            partial_exprs.append(F.min(out).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif how == "max":
            partial_exprs.append(F.max(out).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {how}")
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi-join on `key` with the big side's rows scattered
    across `salt` sub-partitions per key and the small side replicated
    `salt` ways — a hot key becomes `salt` shuffle partitions instead of
    one.  Shuffle volume: |big| + salt·|small| (cheap when small is small,
    which is the only time you salt).

    Only inner/left are semantics-preserving under salting: with
    'right'/'full', small-side rows with no big-side match would surface
    once per salt replica."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}): "
            "right/full would duplicate unmatched small-side rows salt times"
        )
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int")
    )
    small_salted = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = big_salted.join(small_salted, [key, "__salt"], how)
    return out.drop("__salt")
