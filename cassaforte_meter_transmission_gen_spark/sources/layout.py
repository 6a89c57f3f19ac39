"""Storage layouts for the 100 TB design pass (SURVEY §4 O5).

The reference's physical design is ``PRIMARY KEY (said, datetime)`` —
partition by meter, cluster by time (setup_and_notes.txt:20,26,32,38,44).
The Spark-native duals, in increasing strength:

1. **Partitioned parquet** (``write_time_partitioned``): directory
   partitioning on a coarse time bucket (+ optionally a said bucket).
   Catalyst partition-prunes the directory tree, so the flagship read
   ("meters S over [t0,t1)", setup_and_notes.txt:46) touches only the
   matching files. Time buckets are DAYS — one directory per day keeps
   directory counts sane at 100 TB (36.5k dirs/century-meter vs
   86M for per-second dirs).
2. **Bucketed tables** (``write_bucketed``): ``bucketBy(said) +
   sortBy(datetime)`` via ``saveAsTable``. Both sides of a
   meter-aligned join (raw ⋈ rollup, stream ⋈ dim) read co-bucketed
   files and the join plans WITHOUT an Exchange — the shuffle happens
   once at write time, then every subsequent join is free. This is the
   direct analog of Cassandra's partition-local reads.

Bucket counts: a power of two sized so one bucket of the biggest table
fits an executor's working memory (128 buckets ≈ 800 GB/bucket at
100 TB raw — pair with day partitioning so a task reads
(day × bucket) ≈ 2 GB slices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "datetime",
    said_buckets: int | None = None,
    mode: str = "overwrite",
    clustered: bool = False,
    day_splits: int = 16,
) -> None:
    """Write parquet partitioned by event day (and optionally a said
    hash bucket), rows within each file sorted by (said, ts) so
    parquet row-group min/max stats prune time ranges inside a day.

    ``clustered=True`` declares the input already clustered by
    (said, ts) within its partitions (true for the generator, whose
    range splits are per-meter time slices, and for any source re-read
    from this layout): the write then needs NO shuffle — every input
    task streams its slice straight into the day directories, fully
    parallel. With ``clustered=False`` rows are hash-distributed over
    (day[, bucket], said) so a hot day spreads across ``day_splits``
    tasks instead of collapsing into one writer (the naive
    repartition-by-directory-column plan serializes a whole day
    through a single task — at 100 TB, one executor per day).
    Deliberately NOT repartitionByRange: its range-bound sampling pass
    evaluates the input twice, which doubles generation/decode cost of
    a wide array column for zero layout benefit here."""
    out = df.withColumn("p_day", F.to_date(F.col(ts_col)))
    partition_cols = ["p_day"]
    if said_buckets:
        out = out.withColumn("p_said_bucket", F.pmod(F.hash("said"), F.lit(said_buckets)))
        partition_cols.append("p_said_bucket")
    if not clustered:
        split = F.pmod(F.hash("said"), F.lit(day_splits))
        out = (
            out.repartition(*[F.col(c) for c in partition_cols], split)
            .sortWithinPartitions("said", ts_col)
        )
    (
        out.write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a layout written by :func:`write_time_partitioned`; the
    partition columns stay available for explicit pruning predicates
    (Catalyst also derives pruning from ``ts_col`` predicates when the
    query filters on the data column directly)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 32,
    key: str = "said",
    sort: str = "datetime",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table: the one-time shuffle
    that makes every later equi-join/aggregation on ``key``
    exchange-free (SortMergeJoin reads co-bucketed splits directly)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(sort)
        .format("parquet")
        .saveAsTable(table)
    )


def write_ivf_partitioned(
    vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist an embedding table as an on-disk inverted file: directory
    partitioned by nearest-centroid ``cluster_id`` (the IVF cell).

    This is the 100 TB form of operators.similarity.ivf_topk's pruning:
    instead of an equi-join filtering candidate ROWS by probed cell,
    the probe list becomes a partition predicate and Catalyst prunes
    whole directories — a 4-of-16-probe query reads 1/4 of the FILES,
    before any row decoding happens. The centroids come from the same
    deterministic k-means, so the layout and the query-time assignment
    agree exactly."""
    from ..operators.similarity import assign_to_centroid

    assigned = assign_to_centroid(vectors, centroids, vec_col)
    # one directory per cell; repartition by the partition column so a
    # hot cell writes from one task set, not every input task × cell
    (
        assigned.repartition("cluster_id")
        .write.mode(mode)
        .partitionBy("cluster_id")
        .parquet(path)
    )


def read_ivf_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read an IVF layout; ``cluster_id`` is the partition column, so
    ``filter(col("cluster_id").isin(probes))`` directory-prunes."""
    return spark.read.parquet(path)
