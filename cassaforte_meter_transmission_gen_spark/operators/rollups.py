"""Multi-granularity energy rollups (reference K3-K5/A2-A4, core.clj:122-153).

The reference maintains minute/hour/day COUNTER tables by issuing an
``UPDATE ... SET joules = joules + ?`` per transmission — insert-time
pre-aggregation so reads never scan raw data (setup_and_notes.txt:46,
SURVEY §4 O3). Counter increments are commutative sums, so the exact
Spark-native equivalent is a grouped sum keyed (said, date_trunc(grain)).

Scale design (SURVEY §4 O4): each grain derives from the NEXT FINER one
— sum is associative, so minute-from-second, hour-from-minute,
day-from-hour are exact and each step aggregates ~60× fewer rows than
re-scanning raw. Catalyst plans partial (map-side) + final aggregation,
so the shuffle carries only one row per (said, bucket) per task. At
100 TB the raw→second step is the only pass over raw data; everything
coarser touches pre-shrunk tables. Streaming variant: see
``streaming.pipeline`` (windowed stateful sum in update mode — the
reference's counter-increment semantics, T3/T4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import GRAIN_TRUNC

#: derivation order — each from the previous (finer) grain
CHAIN = ("minute", "hour", "day")


def rollup_from_second(finer: DataFrame, grain: str) -> DataFrame:
    """One rollup step: (said, datetime, joules) at a finer grain →
    the same shape at ``grain``. joules widens to long (COUNTER → sum,
    SURVEY §1.2)."""
    trunc = GRAIN_TRUNC[grain]
    return (
        finer.groupBy("said", trunc(F.col("datetime")).alias("datetime"))
        .agg(F.sum("joules").cast("long").alias("joules"))
    )


def rollup_chain(second_df: DataFrame) -> dict[str, DataFrame]:
    """Build all grains, each from the next finer (exact, associative).

    Returns {"second": ..., "minute": ..., "hour": ..., "day": ...}.
    """
    out: dict[str, DataFrame] = {"second": second_df}
    finer = second_df
    for grain in CHAIN:
        finer = rollup_from_second(finer, grain)
        out[grain] = finer
    return out


def route_grain(rollups: dict[str, DataFrame], grain: str) -> DataFrame:
    """Grain routing (SURVEY §4 O4): answer a query at ``grain`` from the
    coarsest sufficient pre-aggregated table — O(1)-ish reads instead of
    raw scans, the reference's load-bearing design decision."""
    return rollups[grain]
