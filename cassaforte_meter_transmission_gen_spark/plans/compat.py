"""Oracle-parity helpers shared by catalog queries.

Exact money/double aggregation: summing doubles is order-dependent in
the last bits, and Spark sums in parallel while DuckDB sums serially —
so both sides cast to DECIMAL first (exact, commutative) and cast the
total back to DOUBLE. ``DECIMAL(18,6)`` holds every corpus money value
and product with headroom; the double→decimal rounding of the *same*
IEEE double is identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec_sum(col: Column) -> Column:
    """Order-independent exact sum of a double expression → double."""
    return F.sum(col.cast(DEC)).cast("double")


def dec_avg(col: Column) -> Column:
    """Exact-sum average → double (sum_decimal / count)."""
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias("avg")


def sql_dec_sum(expr: str) -> str:
    """DuckDB text mirror of :func:`dec_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_dec_avg(expr: str) -> str:
    """DuckDB text mirror of :func:`dec_avg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}))"
