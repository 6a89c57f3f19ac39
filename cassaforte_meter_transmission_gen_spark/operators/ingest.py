"""Batch ingest pipeline — the reference's write fan-out as one job.

The reference's ``-main`` loop issues five writes per transmission:
raw samples, the per-second energy row, and three counter increments
(core.clj:100-153, SURVEY §2.2 K1-K5). The Spark-native batch dual is
one lineage: generator → second-grain energy → rollup chain, with each
table written as parquet (the Cassandra connector slots in as an
alternative sink format unchanged — same DataFrames, different
``.format()``).

Scale design:

- The raw table is written day-partitioned with rows sorted
  (said, datetime) inside files (sources.layout.write_time_partitioned)
  — the reference's PRIMARY KEY (said, datetime) layout, so the
  flagship read prunes to one day directory and row-group stats prune
  the time range (SURVEY §4 O5).
- Rollup tables are tiny relative to raw (1/60, 1/3600, 1/86400 of the
  second table); they are written sorted by (said, datetime) so point
  reads skip row groups.
- Each grain derives from the next finer one (operators.rollups), so
  raw data is scanned exactly once regardless of how many grains are
  maintained — the reference's insert-time pre-aggregation, O3.
- The five writes share the generator lineage; Spark schedules them as
  separate jobs, but the second-grain table is written first and the
  chain re-reads it from parquet, so the (cheap) generator runs twice
  and the (expensive, at real scale) raw arrays are never recomputed
  for rollups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import Observation
from pyspark.sql import functions as F

from ..io import ParquetSink, TableSink
from ..sources.layout import write_time_partitioned
from ..sources.meter_generator import (
    DEFAULT_NUM_METERS,
    DEFAULT_SECONDS,
    DEFAULT_START_SAID,
    T0_EPOCH,
    meter_samples_second,
    transmissions,
)
from .rollups import CHAIN, rollup_from_second

TABLES = ("meter_samples", "meter_samples_second") + tuple(
    f"meter_samples_{g}" for g in CHAIN
)


def ingest_batch(
    spark: SparkSession,
    out_dir: str,
    num_meters: int = DEFAULT_NUM_METERS,
    start_said: int = DEFAULT_START_SAID,
    t0_epoch: int = T0_EPOCH,
    seconds: int = DEFAULT_SECONDS,
    write_raw: bool = True,
    report: dict[str, int] | None = None,
    sink: TableSink | None = None,
) -> dict[str, str]:
    """Generate ``num_meters × seconds`` transmissions and materialize
    the reference's five tables through ``sink`` (default: a
    :class:`~..io.ParquetSink` rooted at ``out_dir``; pass a
    :class:`~..io.CassandraSink` to target the reference's actual table
    family — same DataFrames, different physical writer). Returns
    {table_name: path}. ``write_raw=False`` skips the (bulky) raw
    sample table for rollup-only maintenance runs.

    Pass ``report={}`` to get per-table written-row counts filled in —
    the reference's success-callback accounting (A5, core.clj:68-85:
    every async write fires a counted success/failure handler; "All 5
    queries have succeeded" when the count reaches num_queries).
    Spark-native dual: an ``Observation`` per sink collects the row
    count from the job itself (no second scan, no driver loop)."""
    sink = sink or ParquetSink(out_dir)
    paths = {t: os.path.join(out_dir, t) for t in TABLES}

    def _observed(df: DataFrame, table: str) -> DataFrame:
        if report is None:
            return df
        obs = Observation(f"ingest_{table}")
        _OBSERVATIONS[table] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    _OBSERVATIONS: dict[str, Observation] = {}

    def _write_raw() -> None:
        raw = transmissions(spark, num_meters, start_said, t0_epoch, seconds)
        if isinstance(sink, ParquetSink):
            # layout policy is parquet-specific: generator range-splits
            # are per-meter time slices → already clustered by
            # (said, datetime): shuffle-free parallel write into
            # day-partitioned directories
            write_time_partitioned(
                _observed(raw, "meter_samples"),
                paths["meter_samples"],
                clustered=True,
            )
        else:  # connector sinks rely on their own partitioner
            sink.write(_observed(raw, "meter_samples"), "meter_samples")

    def _write_second_and_rollups() -> None:
        # the generator's range splits are per-meter time slices, so the
        # second table is already clustered by (said, datetime): write the
        # slices directly — shuffle-free, and row-group stats still prune
        # both meter and time predicates (a repartition("said") here costs
        # a shuffle and buys nothing the clustering doesn't already give)
        second = meter_samples_second(
            spark, num_meters, start_said, t0_epoch, seconds
        )
        sink.write(_observed(second, "meter_samples_second"), "meter_samples_second")

        finer = sink.read(spark, "meter_samples_second")
        for grain in CHAIN:
            finer = rollup_from_second(finer, grain)
            sink.write(
                _observed(finer, f"meter_samples_{grain}"), f"meter_samples_{grain}"
            )
            finer = sink.read(spark, f"meter_samples_{grain}")

    # The raw-array write and the second+rollup chain share only the
    # (cheap) generator lineage and write disjoint tables, so they are
    # independent Spark jobs — submit them from two driver threads
    # (guide §2.6) so the small rollup jobs back-fill executors idled by
    # the big raw write's task tail instead of running after it.
    # Measured at bench shape (4 meters × 7200 s): raw ≈ 2.6-4.2 s,
    # second+rollups ≈ 2.3-2.7 s sequential → overlapped total ≈ raw
    # alone. FIFO scheduling keeps the raw job's resource priority.
    if write_raw:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fr = pool.submit(_write_raw)
            fs = pool.submit(_write_second_and_rollups)
            fr.result()
            fs.result()
    else:
        _write_second_and_rollups()

    if report is not None:
        for table, obs in _OBSERVATIONS.items():
            report[table] = obs.get["rows"]
    return paths


def read_table(spark: SparkSession, paths: dict[str, str], table: str) -> DataFrame:
    """Read one ingested table back (partition columns dropped from the
    raw table so the schema matches the logical one)."""
    df = spark.read.parquet(paths[table])
    extra = [c for c in df.columns if c.startswith("p_")]
    return df.drop(*extra) if extra else df
