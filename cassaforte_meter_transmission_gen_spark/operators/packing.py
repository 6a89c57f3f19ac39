"""Sequence packing for training-data pipelines (SURVEY §2.10 family):
assign documents to fixed token-budget packs in a deterministic global
order — the step between "clean corpus" and "training batches".

The core primitive is an exact GLOBAL running total. The naive form is
``sum().over(Window.orderBy(col))`` with no partition key, which Spark
executes on ONE task — the classic 100 TB trap. The two-pass form here
is the scale-correct shape:

1. range-partition by the order column and sort within partitions
   (parallel, one exchange);
2. per-partition partial sums via a window PARTITIONED by the physical
   partition id (parallel — each task scans its own slice once);
3. per-partition totals (one tiny row per partition) are collected,
   prefix-summed on the driver, and broadcast back as offsets.

The result is identical to the single-task window for any partitioning
(prefix sums are associative), so the DuckDB oracle can use the plain
window form while the engine runs the parallel one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_total(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_total",
    n_partitions: int = 32,
) -> DataFrame:
    """Exact exclusive prefix sum of ``value_col`` in ascending
    ``order_col`` order (out_col = sum of all STRICTLY EARLIER rows),
    computed with per-partition parallelism as described above.
    ``order_col`` must be unique (it is the global tiebreak)."""
    parted = (
        df.repartitionByRange(n_partitions, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    # PERSIST before the two actions below: repartitionByRange picks its
    # range boundaries by reservoir-sampling the input per JOB, so two
    # separate evaluations of this lineage may legally place boundary
    # rows in different partitions once the sample no longer covers all
    # rows (exactly the >memory regime this operator exists for). The
    # totals job below materializes the cache; the caller's action then
    # reads the SAME partitioning instead of re-rolling it — without
    # this, the collected per-pid offsets can disagree with the output
    # job's __pid assignment (silently wrong sums / NULL offsets).
    # MEMORY_AND_DISK: evicted blocks spill, they are not recomputed.
    # The cache is released when the returned DataFrame's lineage is
    # garbage-collected (ContextCleaner), or by the caller via unpersist.
    parted = parted.persist()
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = parted.withColumn(
        "__local", F.sum(value_col).over(w) - F.col(value_col)
    )
    # one row per partition reaches the driver — bounded by the
    # partition count, never the data
    totals = {
        r["__pid"]: r["__t"]
        for r in parted.groupBy("__pid")
        .agg(F.sum(value_col).alias("__t"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        ),
        F.col("__pid"),
    )
    return local.withColumn(out_col, (F.col("__local") + offset_col)).drop(
        "__pid", "__local"
    )


def token_budget_packs(
    docs_with_tokens: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy contiguous packing: documents in ascending ``id_col``
    order fill pack 0 until ``budget`` tokens are exceeded, then pack 1,
    and so on — ``pack_id = floor(exclusive_prefix_sum / budget)``.
    A document straddling a boundary stays with the pack it started in
    (packs can overflow by at most one document), which keeps the
    assignment a pure per-row function of the prefix sum — no sequential
    state, so it scales as far as the prefix sum does.

    Returns one row per pack: (pack_id, n_docs, pack_tokens,
    first_doc, last_doc)."""
    cum = global_running_total(
        docs_with_tokens, id_col, tokens_col, out_col="__prev"
    )
    return (
        cum.withColumn(
            "pack_id", F.floor(F.col("__prev") / F.lit(budget)).cast("long")
        )
        .groupBy("pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(tokens_col).cast("long").alias("pack_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )
