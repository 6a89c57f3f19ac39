"""Semantics tests for the round-8 operator additions: SCD Type 2
history (operators.cdc.scd2_history), the KMV distinct sketch
(operators.sketches.kmv_*), the blocked fuzzy join, and linear
attribution — the parts the registry oracle gate pins by value but not
by property (interval invariants, estimator error bounds, credit
conservation)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cassaforte_meter_transmission_gen_spark.operators.cdc import scd2_history
from cassaforte_meter_transmission_gen_spark.operators.sketches import (
    KMV_K,
    kmv_estimate_col,
    kmv_merge,
    kmv_sketch,
)
from cassaforte_meter_transmission_gen_spark.plans import REGISTRY


# --- SCD Type 2 ---


@pytest.fixture(scope="module")
def scd2_out(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", 1, "u"),
            (1, "a2", 2, "u"),
            (2, "b", 1, "d"),
        ],
        "k INT, v STRING, seq INT, op STRING",
    )
    rows = scd2_history(snap, changes, key_cols=["k"]).collect()
    return {(r.k, r.valid_from_seq): r for r in rows}


def test_scd2_update_chain_versions(scd2_out):
    """A twice-updated key keeps all three versions with touching
    validity intervals and exactly one current row."""
    v0, v1, v2 = scd2_out[(1, 0)], scd2_out[(1, 1)], scd2_out[(1, 2)]
    assert (v0.v, v0.valid_to_seq, v0.is_current) == ("a", 1, False)
    assert (v1.v, v1.valid_to_seq, v1.is_current) == ("a1", 2, False)
    assert (v2.v, v2.valid_to_seq, v2.is_current) == ("a2", None, True)


def test_scd2_delete_closes_without_current(scd2_out):
    """A delete closes the open version and contributes no row of its
    own — the key ends with zero current versions."""
    dead = [r for (k, _), r in scd2_out.items() if k == 2]
    assert len(dead) == 1
    assert (dead[0].valid_to_seq, dead[0].is_current) == (1, False)


def test_scd2_untouched_key_single_open_version(scd2_out):
    v = scd2_out[(3, 0)]
    assert (v.v, v.valid_to_seq, v.is_current) == ("c", None, True)


def test_scd2_at_most_one_current_per_key(spark, sf_small):
    hist = REGISTRY["cdc_scd2_orders_history"].fn(spark, sf_small)
    bad = (
        hist.groupBy("o_orderkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_current"))
        .filter(F.col("n_current") > 1)
        .count()
    )
    assert bad == 0


# --- KMV sketch ---


def test_kmv_exact_below_k(spark):
    """Fewer than k distinct keys → the sketch IS the value set and the
    estimate is exact."""
    df = spark.range(100).selectExpr("id % 37 AS k")
    sk = kmv_sketch(df, "k", k=64)
    est = sk.agg(
        kmv_estimate_col(F.count("*"), F.max("h"), k=64).alias("est")
    ).collect()[0]
    assert est.est == 37


def test_kmv_estimator_error_bound(spark):
    """n=20000 distinct keys, k=256: the (k-1)·D/h_k estimate should
    land within ~5/sqrt(k) ≈ 31% (loose deterministic bound; the
    observed error for this fixed hash/key set is far smaller and
    pinned by the registry oracle)."""
    n = 20000
    df = spark.range(n).selectExpr("CONCAT('key-', id) AS k")
    sk = kmv_sketch(df, "k", k=KMV_K)
    est = sk.agg(
        kmv_estimate_col(F.count("*"), F.max("h")).alias("est")
    ).collect()[0].est
    assert abs(est - n) / n < 5 / (KMV_K**0.5)


def test_kmv_merge_equals_sketch_of_union(spark):
    """Mergeability — the property that makes KMV a rollup-table
    citizen: union of per-shard sketches re-taken to k equals the
    sketch of the unioned input."""
    a = spark.range(0, 3000).selectExpr("CONCAT('u', id) AS k")
    b = spark.range(2000, 5000).selectExpr("CONCAT('u', id) AS k")
    merged = kmv_merge(
        kmv_sketch(a, "k").unionByName(kmv_sketch(b, "k"))
    )
    direct = kmv_sketch(a.unionByName(b), "k")
    assert [r.h for r in merged.collect()] == [r.h for r in direct.collect()]


# --- blocked fuzzy join ---


def test_fuzzy_join_resolves_every_probe_exactly_once(spark, sf_small):
    out = REGISTRY["join_fuzzy_blocked_levenshtein"].fn(spark, sf_small)
    rows = out.collect()
    probes = [r.probe for r in rows]
    assert len(probes) == len(set(probes))  # best-match is unique
    # dropping the first character costs at most one edit to undo — and
    # exactly zero when the typo'd form is itself a catalog name (the
    # corpus has e.g. both 'gold anvil' and 'old anvil')
    assert all(r.distance <= 1 for r in rows)
    assert all(
        r.matched_name[1:] == r.probe or r.matched_name == r.probe
        for r in rows
    )


# --- linear attribution ---


def test_attribution_conserves_purchase_value(spark, sf_small):
    """Every purchase with ≥1 touch in the lookback splits its value
    into integer micro-unit credits of v_micro DIV n_touches each:
    the total credited micro can fall short of the total attributable
    micro ONLY by the floor remainders, which are < 1 micro-unit per
    credit — so 0 ≤ shortfall < n_credits, exactly (int64 on both
    sides, no tolerance band)."""
    out = REGISTRY["events_attribution_linear_7d"].fn(spark, sf_small)
    row = out.agg(
        F.sum("credited_micro").alias("c"),
        F.sum("n_credits").alias("n"),
    ).collect()[0]

    e = spark.read.parquet(f"{sf_small}/events.parquet")
    p = e.filter(F.col("event_type") == "purchase").alias("p")
    t = e.filter(F.col("event_type") != "purchase").alias("t")
    attributable = (
        p.join(
            t,
            (F.col("t.user_id") == F.col("p.user_id"))
            & (F.col("t.ts") <= F.col("p.ts"))
            & (F.col("t.ts") > F.col("p.ts") - F.expr("INTERVAL 7 DAY")),
            "left_semi",
        )
        .agg(
            F.sum(
                F.expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
            ).alias("t")
        )
        .collect()[0]
        .t
    )
    shortfall = attributable - row.c
    assert 0 <= shortfall < row.n


def test_quantile_sample_merge_equals_global_sketch(spark):
    """Mergeability (the property the 100 TB shard/day rollup relies
    on): the union + re-take-k of disjoint-slice sketches is EXACTLY
    the sketch one global pass draws — same (h, v) rows."""
    from cassaforte_meter_transmission_gen_spark.operators.sketches import (
        quantile_sample_merge,
        quantile_sample_sketch,
    )

    df = spark.range(0, 5000).selectExpr(
        "id AS k", "CAST((id * 37) % 1000 AS DOUBLE) AS val"
    )
    whole = quantile_sample_sketch(df, "k", "val", k=64).collect()
    parts = [
        quantile_sample_sketch(
            df.filter(F.col("k") % 3 == i), "k", "val", k=64
        )
        for i in range(3)
    ]
    stacked = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = quantile_sample_merge(stacked, k=64).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, whole))


def test_quantile_sample_estimates_within_sampling_error(spark):
    """On a known uniform distribution the k=512 sample's median must
    land within a few standard errors of the true median (binomial
    se ≈ 0.5/sqrt(k) ≈ 2.2% of the range)."""
    from cassaforte_meter_transmission_gen_spark.operators.sketches import (
        quantile_sample_sketch,
    )

    df = spark.range(0, 20000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS val")
    sk = quantile_sample_sketch(df, "k", "val", k=512)
    est = sk.agg(F.expr("percentile(v, 0.5)").alias("m")).collect()[0].m
    assert abs(est - 10000) < 0.1 * 20000  # ±4.5 se


def test_pr_auc_matches_serial_integer_model(spark, sf_small):
    """events_model_pr_auc_exact lands on the identical ap_ppm as a
    serial pure-Python average-precision stepping the same integer
    quantization (nano-unit precision per threshold, floor divisions
    in the same order) over the same (score, label) pairs."""
    row = REGISTRY["events_model_pr_auc_exact"].fn(spark, sf_small).head()

    import duckdb

    pairs = duckdb.sql(
        f"""SELECT CAST(floor(value) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS l
            FROM read_parquet('{sf_small}/events.parquet')"""
    ).fetchall()
    from collections import defaultdict

    cnt, pos = defaultdict(int), defaultdict(int)
    for s, l in pairs:
        cnt[s] += 1
        pos[s] += l
    p_tot = sum(pos.values())
    t_tot = sum(cnt.values())
    numer = cum_p = cum_t = 0
    for s in sorted(cnt, reverse=True):
        cum_p += pos[s]
        cum_t += cnt[s]
        numer += pos[s] * ((cum_p * 1_000_000_000) // cum_t)
    assert row["n_pos"] == p_tot
    assert row["n_neg"] == t_tot - p_tot
    assert row["base_rate_ppm"] == p_tot * 1_000_000 // t_tot
    assert row["ap_ppm"] == numer // (p_tot * 1000)
    # sanity: a noise scorer's AP sits near the base rate
    assert abs(row["ap_ppm"] - row["base_rate_ppm"]) < 120_000


def test_ks_statistic_matches_serial_integer_model(spark, sf_small):
    """events_model_ks_statistic equals a serial pure-Python KS over
    the same integer CDF-difference arithmetic, including the
    smallest-argmax threshold tie-break."""
    row = REGISTRY["events_model_ks_statistic"].fn(spark, sf_small).head()

    import duckdb

    pairs = duckdb.sql(
        f"""SELECT CAST(floor(value) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS l
            FROM read_parquet('{sf_small}/events.parquet')"""
    ).fetchall()
    from collections import defaultdict

    cnt, pos = defaultdict(int), defaultdict(int)
    for s, l in pairs:
        cnt[s] += 1
        pos[s] += l
    p = sum(pos.values())
    n = sum(cnt.values()) - p
    cum_p = cum_n = 0
    maxd, arg = -1, None
    for s in sorted(cnt):
        cum_p += pos[s]
        cum_n += cnt[s] - pos[s]
        diff = abs(cum_p * n - cum_n * p)
        if diff > maxd:
            maxd, arg = diff, s
    assert row["n_pos"] == p and row["n_neg"] == n
    assert row["ks_ppm"] == maxd * 1_000_000 // (p * n)
    assert row["ks_at_score"] == arg
    # noise fixture: KS stays small
    assert row["ks_ppm"] < 120_000
