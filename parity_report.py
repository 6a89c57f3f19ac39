#!/usr/bin/env python
"""Full-registry correctness artifact: run EVERY registered query
against its DuckDB oracle (the same gate as tests/test_parity_registry
and the grading driver) and write ``PARITY_r{N}.json`` with one
pass/fail row per query.

Why this exists: the grading driver externally verifies only the
alphabetically-first 50 registry names; this artifact, committed each
round, is the externally auditable proof for the rest — every name, at
the driver's own scale factor (sf0.01 by default), under the stricter
local comparison (exact canonical value-string equality, see
tests/parity.py).

Usage::

    python parity_report.py [--sf-dir /root/testdata/sf0.01] [--round N]

Round defaults to max(BENCH_r*.json)+1 — i.e. "the round in progress".
Exits nonzero if any query fails, so it doubles as a pre-snapshot gate.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _infer_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def rotate_slice(names: list[str], rnd: int, width: int = 50) -> list[str]:
    """Deterministic per-round verification slice, DISJOINT from the
    grading driver's window (the alphabetically-first ``width`` names,
    which the driver re-checks externally every round): the remaining
    names are ranked by md5(round:name) and the first ``width`` taken,
    so successive rounds walk different external-style samples and
    coverage accumulates across rounds (VERDICT r12 next-round #7)."""
    import hashlib

    ordered = sorted(names)
    rest = ordered[width:]
    keyed = sorted(
        rest,
        key=lambda n: hashlib.md5(f"{rnd}:{n}".encode()).hexdigest(),
    )
    return sorted(keyed[:width])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--rotate",
        action="store_true",
        help="run only the round-seeded 50-query rotating slice "
        "(disjoint from the driver's alphabetical first-50 window) "
        "and write PARITY_ROTATE_r{N}.json",
    )
    args = ap.parse_args()
    rnd = args.round if args.round is not None else _infer_round()
    default_name = (
        f"PARITY_ROTATE_r{rnd:02d}.json"
        if args.rotate
        else f"PARITY_r{rnd:02d}.json"
    )
    out_path = args.out or os.path.join(REPO, default_name)

    from cassaforte_meter_transmission_gen_spark.plans import REGISTRY
    from cassaforte_meter_transmission_gen_spark.session import get_spark
    from tests.parity import compare, duck_connection

    names = (
        rotate_slice(list(REGISTRY), rnd)
        if args.rotate
        else sorted(REGISTRY)
    )
    spark = get_spark("parity-report")
    con = duck_connection(args.sf_dir)
    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            df = q.fn(spark, args.sf_dir)
            if q.oracle is None:
                rows = df.count()
                status, problems = "rows_only", []
            else:
                problems = compare(df, con, q.oracle)
                rows = None
                status = "pass" if not problems else "fail"
        except Exception as e:  # a crashing query is a failing query
            status, problems, rows = "fail", [f"exception: {e!r:.500}"], None
        secs = round(time.time() - t0, 2)
        if status == "fail":
            n_fail += 1
        row = {"status": status, "secs": secs}
        if problems:
            row["problems"] = problems
        if rows is not None:
            row["rows"] = rows
        results[name] = row
        print(f"{name}: {status} ({secs}s)", flush=True)

    # auditability stamp (VERDICT r9 item 8): record which code this
    # artifact verified, so "artifact predates features" is checkable
    # mechanically — bench.py compares the name set against the live
    # registry every run and flags staleness into the graded record.
    try:
        import subprocess

        git_head = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001
        git_head = None

    summary = {
        "round": rnd,
        "window": "rotating-50-disjoint-from-driver" if args.rotate else "full-registry",
        "sf_dir": args.sf_dir,
        "git_head": git_head,
        "registry_total": len(REGISTRY),
        "total": len(results),
        "pass": sum(1 for r in results.values() if r["status"] == "pass"),
        "rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
        "fail": n_fail,
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"\n{summary['total']} queries: {summary['pass']} pass, "
        f"{summary['rows_only']} rows-only, {n_fail} fail -> {out_path}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
