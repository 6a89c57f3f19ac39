"""Approximate-aggregate quality gates: sketch outputs can't be
hash-compared across engines, so the check is an error bound against
the exact answer computed in the same engine."""

from __future__ import annotations

import pyspark.sql.functions as F

from cassaforte_meter_transmission_gen_spark.plans import REGISTRY
from cassaforte_meter_transmission_gen_spark.schemas import load_table


def test_approx_distinct_within_rsd(spark, sf_small):
    approx = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_approx_distinct_suppliers"].fn(spark, sf_small).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load_table(spark, sf_small, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("suppliers"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, row in approx.items():
        for a_col, e_col in (
            ("approx_suppliers", "suppliers"),
            ("approx_parts", "parts"),
        ):
            a, e = row[a_col], exact[flag][e_col]
            # rsd=0.02 → generous 5σ bound; deterministic (fixed hash)
            assert abs(a - e) <= max(5, 0.10 * e), (flag, a_col, a, e)


def test_approx_percentiles_within_rank_error(spark, sf_small):
    """percentile_approx vs the exact quartiles: with accuracy=10000
    and groups ≪ 10000 rows the sketch must in fact be exact-or-
    adjacent; assert a generous absolute bound derived from the data's
    quantity range instead of exact equality so the test is robust to
    sketch-impl changes."""
    approx = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_approx_percentiles_quantity"].fn(spark, sf_small).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_percentiles_quantity"].fn(spark, sf_small).collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        for q in ("q25", "q50", "q75"):
            # exact percentile interpolates; the sketch returns a real
            # data value — allow one quantity step (corpus quantities
            # are integers 1..50)
            assert abs(a[q] - e[q]) <= 1.0, (flag, q, a[q], e[q])
