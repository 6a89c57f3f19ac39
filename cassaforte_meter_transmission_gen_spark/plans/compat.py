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


def sql_ntile_from_rank(rank0: str, n: int, k: int) -> str:
    """SQL ``ntile(k)`` as pure integer arithmetic over a 0-based
    global rank column: ntile puts the larger buckets FIRST — the first
    ``n % k`` buckets hold ``n // k + 1`` rows, the rest ``n // k``.
    (The tempting closed form ``rank0*k DIV n + 1`` equals ntile only
    when ``k`` divides ``n`` — property-tested against DuckDB's ntile
    in tests/test_properties.py.) Valid for any n ≥ 1; when k > n the
    else-branch is unreachable (divisor clamped to keep the expression
    well-formed)."""
    q, rem = divmod(n, k)
    threshold = rem * (q + 1)
    return (
        f"CAST(CASE WHEN {rank0} < {threshold} THEN {rank0} DIV {q + 1} "
        f"ELSE {rem} + ({rank0} - {threshold}) DIV {max(q, 1)} END AS INT) + 1"
    )
