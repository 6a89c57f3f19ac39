#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline catalog
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full
materialization, no driver collect). Wall time per query includes plan
+ execution; the JVM/session warmup is excluded via a warmup query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassaforte_meter_transmission_gen_spark.plans import REGISTRY  # noqa: E402
from cassaforte_meter_transmission_gen_spark.session import get_spark  # noqa: E402

#: headline set: the reference's own pipeline (generator → joules →
#: rollups → report) plus the heaviest catalog shapes per family.
HEADLINE = [
    "meter_joules_second",
    "meter_rollup_minute",
    "meter_rollup_day",
    "meter_daily_report",
    "meter_rolling_energy_5m",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q18_large_volume_customers",
    "window_running_total",
    "events_sessionization_30m",
    "sort_limit_top100_lineitems",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_signatures",
    "ann_bruteforce_cosine_topk",
    "text_token_top50",
    "pipeline_training_prep",
]

#: scale-path variants timed separately so the 17-query HEADLINE total
#: stays comparable across rounds; these are the bucketed/quantized
#: forms whose value is the 100 TB shape, not the sf0.1 wall-clock
#: (e.g. the LSH dedup at the verification threshold 0.4 is documented
#: near-quadratic — see operators/dedup.py)
SCALE_PATHS = [
    "dedup_embedding_cosine_lsh",
    "dedup_embedding_cosine_lsh_hi",
    "ann_lsh_bucketed_topk",
    "ann_ivf_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("cassaforte-bench")

    # warmup: JVM + parquet footer caches, not counted
    REGISTRY["q06_forecast_revenue"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # the reference's own headline first (on a fresh heap): the
    # five-table write fan-out (generate → raw + second + minute/hour/
    # day), measured end-to-end to real parquet. Reference throughput =
    # 15k samples/meter/sec × 2 meters = 30k samples/sec (BASELINE.md);
    # ours is derived the same way: meter-seconds × 15000 / elapsed.
    import shutil
    import tempfile

    from cassaforte_meter_transmission_gen_spark.operators.ingest import ingest_batch

    n_meters, n_seconds = 4, 7200

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        # failure-isolated: one broken query must not null the whole
        # round's bench — record the error and keep timing the rest
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        finally:
            # drop persisted intermediates (e.g. dedup shingle caches) so
            # one query's cache doesn't pressure the next one's heap
            spark.catalog.clearCache()

    scale_times: dict[str, float] = {}
    for name in SCALE_PATHS:
        t0 = time.perf_counter()
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            scale_times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        finally:
            spark.catalog.clearCache()

    # the 100 TB LSH-dedup pruning claim, measured: the hi config
    # (16 tables × 8 planes, threshold 0.8) should confine the verify
    # join to ≈ 16·0.5⁸ ≈ 6% of all pairs (vs the documented
    # near-quadratic 0.4-threshold regime). Single-row stats query —
    # the same plan the dedup_embedding_cosine_lsh_hi oracle gates.
    lsh_hi_stats = None
    try:
        row = REGISTRY["dedup_embedding_cosine_lsh_hi"].fn(spark, sf_dir).head()
        lsh_hi_stats = {
            "n_candidates": row["n_candidates"],
            "n_pairs": row["n_pairs"],
            "candidate_fraction": round(row["candidate_fraction"], 6),
        }
    except Exception as exc:  # noqa: BLE001
        errors["lsh_hi_stats"] = f"{type(exc).__name__}: {exc}"[:500]
    finally:
        spark.catalog.clearCache()

    # the write-heavy ingest benchmark runs AFTER the query loop: its
    # 28800 × 15k-float raw arrays leave the heap under GC pressure
    # that would otherwise bleed ~45 s into whichever query runs next
    # (measured on q01 before the reorder)
    out = tempfile.mkdtemp(prefix="bench_ingest_")
    t0 = time.perf_counter()
    try:
        ingest_batch(spark, out, num_meters=n_meters, seconds=n_seconds)
        ingest_sec = round(time.perf_counter() - t0, 3)
    except Exception as exc:  # noqa: BLE001
        errors["ingest_five_tables"] = f"{type(exc).__name__}: {exc}"[:500]
        ingest_sec = None
    finally:
        shutil.rmtree(out, ignore_errors=True)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_catalog_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "scale_path_queries": scale_times,
                "lsh_hi_candidate_pruning": lsh_hi_stats,
                "errors": errors,
                "sf": sf,
                "ingest_five_tables_sec": ingest_sec,
                "ingest_samples_per_sec": (
                    round(n_meters * n_seconds * 15000 / ingest_sec)
                    if ingest_sec
                    else None
                ),
                "reference_samples_per_sec": 30000,
            }
        )
    )


if __name__ == "__main__":
    main()
