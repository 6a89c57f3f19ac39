#!/usr/bin/env python
"""Scale-growth probe: measure the scale-path family at 1× / K× corpus
sizes and report per-query time-growth ratios (VERDICT r10 next-round
item #1 — turn "100 TB by design" into data).

Corpora are staged by ``sources.scaling.stage_scaled_corpus`` —
structure-preserving K× amplification of the driver's sf0.1 tables
(facts replicated with disjoint key/shingle/dimension spaces, dims
fixed), so measured growth reflects the PLAN's scaling, not artificial
cross-replica duplicate blowup.

Methodology: every query runs twice per scale and the MIN is the
growth statistic — the steady-state figure, immune to the first-run
JIT/Python-worker-startup noise that swings ±45% on the ANN family
(bench.py BEST_OF_TWO note). Both runs land in the artifact. ANN
index training (paid once per corpus fingerprint) is timed separately
per scale as ``ann_train_sec`` — serve queries measure pure serving.

Output: SCALING_r{N}.json with, per query, the per-scale times, the
10×/1× ratio, and the log-log growth exponent. Verdict bands:
``linear`` ratio ≤ 12 (judge's bar: ~linear + fixed overhead),
``superlinear`` above.

Usage: python scaling_bench.py [--scales 1,3,10] [--queries a,b,...]
       [--out SCALING_rNN.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import SCALE_PATHS  # noqa: E402
from cassaforte_meter_transmission_gen_spark.plans import REGISTRY  # noqa: E402
from cassaforte_meter_transmission_gen_spark.session import get_spark  # noqa: E402
from cassaforte_meter_transmission_gen_spark.sources.scaling import (  # noqa: E402
    stage_scaled_corpus,
)

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE_ROOT = os.environ.get(
    "SPARK_GRAFT_SCALE_STAGE", "/tmp/spark_graft_scale_corpus"
)

#: growth-ratio acceptance band for a 10× corpus: near-linear plus
#: fixed overhead (the judge's "≤ ~12×/10×" bar)
LINEAR_RATIO_CAP = 12.0


def _round_out_path() -> str:
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    rnd = (max(rounds) + 1) if rounds else 1
    return os.path.join(here, f"SCALING_r{rnd:02d}.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument("--queries", default=",".join(SCALE_PATHS))
    ap.add_argument("--out", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--skip-ann-train",
        action="store_true",
        help="skip the per-corpus ANN artifact training (for probing "
        "queries that train inline or need no persisted index)",
    )
    args = ap.parse_args()
    scales = sorted({int(s) for s in args.scales.split(",") if s})
    queries = [q for q in args.queries.split(",") if q]
    out_path = args.out or _round_out_path()

    corpora: dict[int, dict] = {}
    for k in scales:
        d = os.path.join(STAGE_ROOT, f"x{k:02d}")
        t0 = time.perf_counter()
        manifest = stage_scaled_corpus(BASE_SF_DIR, d, k)
        corpora[k] = {
            "dir": d,
            "rows": manifest["rows"],
            "stage_sec": round(time.perf_counter() - t0, 1),
        }
        print(f"staged x{k}: {manifest['rows']}", file=sys.stderr)

    spark = get_spark("cassaforte-scaling-bench")

    from cassaforte_meter_transmission_gen_spark.sources.ann_store import (
        ANN_STORE_ENV,
        trained_ivf_centroids,
        trained_ivfpq_index,
        trained_pq_codebooks,
        trained_pq_codes,
    )

    import atexit

    ann_store_dir = tempfile.mkdtemp(prefix="scaling_ann_store_")
    os.environ[ANN_STORE_ENV] = ann_store_dir
    atexit.register(shutil.rmtree, ann_store_dir, ignore_errors=True)

    results: dict[str, dict] = {q: {"sec": {}, "runs": {}} for q in queries}
    ann_train: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    load_at_start = [round(x, 2) for x in os.getloadavg()]

    for k in scales:
        d = corpora[k]["dir"]
        # warmup on this corpus (footer caches, codegen)
        REGISTRY["q06_forecast_revenue"].fn(spark, d).write.format(
            "noop"
        ).mode("overwrite").save()
        # per-corpus ANN artifacts (train-once economics, timed apart)
        tr: dict[str, float] = {}
        for label, train in () if args.skip_ann_train else (
            ("ivf_centroids", lambda: trained_ivf_centroids(spark, d)),
            ("pq16_codebooks", lambda: trained_pq_codebooks(spark, d)),
            ("pq8_codebooks", lambda: trained_pq_codebooks(spark, d, n_subspaces=8)),
            ("pq16_codes", lambda: trained_pq_codes(spark, d)),
            ("ivfpq8_index", lambda: trained_ivfpq_index(spark, d)),
        ):
            t0 = time.perf_counter()
            try:
                train()
                tr[label] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                errors[f"x{k}:ann_train_{label}"] = repr(exc)[:300]
            finally:
                spark.catalog.clearCache()
        ann_train[f"x{k}"] = tr

        for name in queries:
            runs: list[float] = []
            for _ in range(max(1, args.runs)):
                t0 = time.perf_counter()
                try:
                    REGISTRY[name].fn(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    runs.append(round(time.perf_counter() - t0, 3))
                except Exception as exc:  # noqa: BLE001
                    errors[f"x{k}:{name}"] = repr(exc)[:300]
                    break
                finally:
                    spark.catalog.clearCache()
            if runs:
                results[name]["runs"][f"x{k}"] = runs
                results[name]["sec"][f"x{k}"] = min(runs)
            print(f"x{k} {name}: {runs}", file=sys.stderr)

    lo, hi = scales[0], scales[-1]
    summary: dict[str, dict] = {}
    for name, r in results.items():
        t_lo, t_hi = r["sec"].get(f"x{lo}"), r["sec"].get(f"x{hi}")
        if not (t_lo and t_hi):
            continue
        ratio = t_hi / t_lo
        exponent = math.log(ratio) / math.log(hi / lo) if hi > lo else 0.0
        cap = LINEAR_RATIO_CAP * (hi / lo) / 10.0
        summary[name] = {
            **{f"sec_x{k}": r["sec"].get(f"x{k}") for k in scales},
            "ratio": round(ratio, 2),
            "exponent": round(exponent, 3),
            "verdict": "linear" if ratio <= cap else "superlinear",
        }

    n_super = sum(1 for s in summary.values() if s["verdict"] == "superlinear")
    out = {
        "base_sf_dir": BASE_SF_DIR,
        "scales": scales,
        "runs_per_point": args.runs,
        "statistic": "min-of-runs (steady state)",
        "linear_ratio_cap_at_10x": LINEAR_RATIO_CAP,
        "load_at_start": load_at_start,
        "corpora": corpora,
        "ann_train_sec": ann_train,
        "queries": summary,
        "runs_raw": {q: results[q]["runs"] for q in results},
        "superlinear_count": n_super,
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({
        "artifact": os.path.basename(out_path),
        "scales": scales,
        "queries": len(summary),
        "superlinear": n_super,
        "errors": len(errors),
    }))


if __name__ == "__main__":
    main()
