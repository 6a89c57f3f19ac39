"""Scan-parallelism guard for small / under-split file sources.

A single small parquet file reads as ONE input split (it is below
``spark.sql.files.maxPartitionBytes``, and a one-row-group file cannot
split finer anyway), which serializes every narrow operation stacked on
the scan — per-row regexp tokenization, decimal casts, broadcast-join
probes, partial aggregation — onto one core while the rest of the
cluster idles. ``spread_small_scan`` repartitions such a source to the
session's default parallelism BEFORE the heavy narrow work; the shuffle
of the small raw rows is cheap relative to the compute it parallelizes.

The gate is METADATA-only (``df.inputFiles()`` — a catalog listing —
plus local file sizes): at 100 TB inputs arrive as many files and/or
enough bytes that the scan splits by ``maxPartitionBytes`` on its own,
so the helper is a structural no-op there — it exists purely to guard
the small-file edge (guide §2.5 "input skew": one huge unsplittable
file, or here one tiny unsplittable file per table).

History: born as ``operators.dedup._spread`` (round 8) for the
shingle-heavy dedup paths; hoisted here in round 14 so the scan-bound
catalog queries (training prep, TPC-H probes, brute-force ANN) share
the same guard instead of re-deriving it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to default parallelism iff it reads from
    fewer files than there are cores AND the bytes are too small for
    the scan to split on its own (≥2 MB compressed per core keeps the
    columnar scan's own splitting / the spread shuffle trade honest).
    Non-file sources (in-memory test fixtures) get the spread — they
    are small by construction."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # non-file plan: can't tell — spread (cheap: small)
        files = []
    if len(files) >= par:
        return df
    local = [f[7:] if f.startswith("file://") else None for f in files]
    if files and all(p is not None for p in local):
        try:
            total = sum(os.path.getsize(p) for p in local)
            if total >= par * (2 << 20):
                return df
        except OSError:
            pass
    return df.repartition(par)
