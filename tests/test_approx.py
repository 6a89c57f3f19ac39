"""Approximate-aggregate quality gates: sketch outputs can't be
hash-compared across engines, so the check is an error bound against
the exact answer computed in the same engine."""

from __future__ import annotations

import pyspark.sql.functions as F

from cassaforte_meter_transmission_gen_spark.plans import REGISTRY
from cassaforte_meter_transmission_gen_spark.schemas import load_table


def test_approx_distinct_within_rsd(spark, sf_small):
    """The query now carries its own error-bound check in-plan (the
    within_bound booleans the driver oracle pins to TRUE); assert the
    booleans hold AND the exact columns agree with an independent
    countDistinct."""
    out = {
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
    assert set(out) == set(exact)
    for flag, row in out.items():
        assert row["suppliers_within_bound"], (flag, row)
        assert row["parts_within_bound"], (flag, row)
        assert row["exact_suppliers"] == exact[flag]["suppliers"]
        assert row["exact_parts"] == exact[flag]["parts"]


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
            # the query's q-columns are the exact interpolated
            # quartiles (hash-gated by the driver); the sketch's rank
            # bound is carried as in-plan booleans
            assert a[q] == e[q], (flag, q, a[q], e[q])
            assert a[f"{q}_within_bound"], (flag, q)
