"""Distributed graph primitives: integer-exact weighted PageRank and
ordered-edge triangle counting (SURVEY §2.10 graph family; the
connected-components labeller lives in operators/dedup.py next to its
dedup use).

Why integer PageRank: the conventional double formulation can never
cross-engine match — parallel summation order changes low bits every
run. Ranks here are parts-per-billion int64s; each step is int64
multiply / truncating-divide / sum, so Spark and a serial SQL oracle
agree bit-for-bit, the same move as the micro-nat perplexity totals
(plans/text_queries.py) and the ppm mixing weights.

Scale shape: edge lists are built ONCE from the fact scan (the caller
pins them with localCheckpoint — dimension-sized here, checkpoint-to-
storage at billion-edge scale); each PageRank iteration is
edges ⋈ ranks ⋈ outdeg plus one partial-agg groupBy, rank state
sharded by vertex id across executors, nothing on the driver. Triangle
counting works on the a<b ordered edge list so each triangle matches
exactly one join assignment; at arboricity-heavy scales orient edges
low-degree → high-degree before the wedge join (count-preserving)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPB = 1_000_000_000
DAMPING_NUM = 85  # damping 0.85 as an integer percentage
TELEPORT_PPB = 150_000_000  # (1 - 0.85) * PPB


def integer_pagerank(edges: DataFrame, n_iters: int = 3) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, w)`` with ranks in
    parts-per-billion int64s, seeded at 1e9 per node.

    Per iteration every node sends ``(r·w) DIV Σw`` along each
    out-edge and re-bases as ``TELEPORT + (85·inflow) DIV 100`` —
    all int64, bit-reproducible. Nodes without in-edges keep the
    teleport base; out-edge-less nodes leak their damped mass (add the
    standard dangling redistribution if the graph has them). Returns
    ``(n, r)``. ``edges`` is referenced 2 + n_iters times — callers
    should pin it (localCheckpoint / persisted table)."""
    nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.sum("w").cast("long").alias("tw"))
    r = nodes.select("n", F.lit(PPB).cast("long").alias("r"))
    for _ in range(n_iters):
        inflow = (
            edges.join(r.withColumnRenamed("n", "src"), "src")
            .join(outdeg, "src")
            .select(F.col("dst"), F.expr("(r * w) DIV tw").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("m"))
        )
        r = nodes.join(
            inflow.withColumnRenamed("dst", "n"), "n", "left"
        ).select(
            "n",
            (
                F.lit(TELEPORT_PPB).cast("long")
                + F.expr(
                    f"({DAMPING_NUM} * COALESCE(m, CAST(0 AS BIGINT)))"
                    " DIV 100"
                )
            ).alias("r"),
        )
    return r


def triangle_count(edges: DataFrame) -> DataFrame:
    """Count triangles in an undirected graph given as an ORDERED edge
    list ``edges(ba, bb)`` with ba < bb and no duplicates: each
    triangle a<b<c matches exactly one (e1=(a,b), e2=(b,c), e3=(a,c))
    assignment — counted once, no /6 correction. Returns one row
    ``(n_nodes, n_edges, n_triangles)``. ``edges`` is referenced five
    times — callers should pin it."""
    n_nodes = (
        edges.select(F.col("ba").alias("x"))
        .union(edges.select(F.col("bb").alias("x")))
        .distinct()
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count("*").cast("long").alias("n_edges"))
    e1 = edges.select(F.col("ba").alias("a1"), F.col("bb").alias("b1"))
    e2 = edges.select(F.col("ba").alias("a2"), F.col("bb").alias("b2"))
    e3 = edges.select(F.col("ba").alias("a3"), F.col("bb").alias("b3"))
    tri = (
        e1.join(e2, e2.a2 == e1.b1)
        .join(e3, (F.col("a3") == F.col("a1")) & (F.col("b3") == F.col("b2")))
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return n_nodes.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(tri))
