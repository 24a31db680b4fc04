"""Shared helpers for cross-engine-deterministic numeric queries.

Double-precision SUM is order-dependent, and Spark/DuckDB will not add the
same values in the same order — so any query compared value-for-value against
the DuckDB oracle aggregates money through DECIMAL(18,2) (exact, associative)
and only converts to DOUBLE in the final projection.  Averages are derived
from the exact decimal sum: round(cast(sum AS double)/count, 6), never the
engine's own avg() (result types differ: Spark avg(decimal) is decimal,
DuckDB's is double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def money_sum(expr: Column, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum → rounded double."""
    return F.round(F.sum(expr), scale).cast("double").alias(alias)


def avg_from_sum(sum_dec: Column, count_col: Column, alias: str, scale: int = 6) -> Column:
    """avg = round(double(sum_dec) / count, scale) — same formula the oracle
    SQL uses, so both engines divide identical doubles by identical longs."""
    return F.round(sum_dec.cast("double") / count_col, scale).alias(alias)


