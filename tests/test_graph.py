"""operators.graph semantics: the integer-PageRank recurrence against
a serial Python model (exact replication — the same discipline as the
BPE and weighted-sampling serial-model tests), fixed-point and
mass-conservation properties, and triangle counts on known graphs."""

from __future__ import annotations

import pyspark.sql.functions as F

from cassaforte_meter_transmission_gen_spark.operators.graph import (
    PPB,
    integer_pagerank,
    triangle_count,
)


def _serial_pagerank(edges: list[tuple], n_iters: int) -> dict:
    """The reference recurrence, serially: int64 multiply →
    truncating divide → sum, teleport re-base."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out: dict = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0) + w
    r = {n: PPB for n in nodes}
    for _ in range(n_iters):
        inflow = {n: 0 for n in nodes}
        for s, d, w in edges:
            inflow[d] += (r[s] * w) // out[s]
        r = {n: 150_000_000 + (85 * inflow[n]) // 100 for n in nodes}
    return r


def _edges_df(spark, triples):
    return spark.createDataFrame(triples, "src INT, dst INT, w BIGINT")


def test_pagerank_uniform_cycle_is_fixed_point(spark):
    """On a symmetric cycle every node forwards its whole rank to one
    successor: 0.15e9 + 0.85e9 = 1e9 exactly, every iteration."""
    r = integer_pagerank(
        _edges_df(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1)]), n_iters=4
    )
    assert {row.r for row in r.collect()} == {PPB}


def test_pagerank_matches_serial_model_exactly(spark):
    """Bit-exact replication of the serial recurrence on an asymmetric
    weighted graph (hub, spokes, a dangling-in node)."""
    triples = [
        (0, 1, 5),
        (0, 2, 3),
        (1, 2, 7),
        (2, 0, 1),
        (2, 1, 2),
        (3, 0, 4),  # node 3 has out-edges but no in-edges
    ]
    got = {
        row.n: row.r
        for row in integer_pagerank(_edges_df(spark, triples), 3).collect()
    }
    assert got == _serial_pagerank(triples, 3)


def test_pagerank_mass_bounded(spark):
    """Truncating divides only ever LOSE sub-ppb mass: total rank stays
    within (0.9·N, N] billions for a graph with no dangling nodes."""
    triples = [(i, (i * 3 + 1) % 7, (i % 4) + 1) for i in range(7)]
    r = integer_pagerank(_edges_df(spark, triples), 3)
    total = r.agg(F.sum("r").alias("t")).collect()[0].t
    n = r.count()
    assert 0.9 * n * PPB < total <= n * PPB


def _pair_df(spark, pairs):
    return spark.createDataFrame(pairs, "ba STRING, bb STRING")


def test_triangle_count_k4(spark):
    """K4 has C(4,3)=4 triangles, 6 edges, 4 nodes."""
    k4 = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]
    row = triangle_count(_pair_df(spark, k4)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)


def test_triangle_count_path_has_none(spark):
    row = triangle_count(
        _pair_df(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    ).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 3, 0)
