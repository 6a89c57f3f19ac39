"""Registry of named queries with optional DuckDB oracle SQL.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, an oracle SQL string DuckDB runs on
the same parquet tables (driver contract, ``__spark_entry__.py``).
Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing values.

Oracle-parity conventions used throughout the catalog:

- Money/double aggregation: both sides compute
  ``CAST(SUM(CAST(expr AS DECIMAL(18,4))) AS DOUBLE)`` — the decimal sum
  is exact and order-independent, so parallel (Spark) vs sequential
  (DuckDB) summation cannot diverge in low-order bits.
- ``SUM(int)`` in DuckDB is INT128 → always ``CAST(... AS BIGINT)``.
- Truncating double→int uses explicit ``floor`` (DuckDB CAST rounds,
  Spark CAST truncates).
- Sorted/top-k queries always carry a unique tie-break key.
- No wall-clock, no rand(): every plan is replayable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..session import configure


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the catalog. The wrapped fn gets the
    engine runtime confs applied (UTC etc.) since the driver owns the
    session."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            # latest-wins would silently SHADOW the earlier query — a
            # duplicate registration once hid a shipped funnel behind a
            # re-implementation for a whole parity cycle. Fail at import.
            raise ValueError(
                f"duplicate catalog registration: {name!r} "
                f"(already registered by "
                f"{REGISTRY[name].fn.__name__!r})"
            )
        REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, tags=tuple(tags))
        return wrapped

    return deco
