#!/usr/bin/env python
"""Regenerate README.md's benchmark block from measured bench JSON —
numbers in prose rot (the old hand-ranged paragraph happened to stay
accurate only by luck), so the README quotes the bench artifact
verbatim instead.

Usage::

    python update_readme_bench.py [--src BENCH_xxx.json] [--local]

Default source: the newest driver-committed ``BENCH_r*.json`` (the
canonical graded artifact); pass ``--local`` to prefer
``BENCH_local.json`` (a same-round quiet-box re-measure). The rendered
block states which file it came from so there is exactly one visible
source of truth. Rewrites the block between the ``BENCH:BEGIN`` /
``BENCH:END`` markers in README.md.

Source formats understood:

- raw ``bench.py`` stdout (one or two JSON lines: optional
  ``{"detail": true, ...}`` then the compact headline line) — the two
  are merged;
- a driver ``BENCH_r{N}.json`` artifact (``{"parsed": {...},
  "tail": "..."}``) — ``parsed`` is the headline; the detail line is
  recovered from the tail when the capture window kept its prefix.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
BEGIN = "<!-- BENCH:BEGIN"
END = "<!-- BENCH:END -->"


def _newest_round_artifact() -> str | None:
    rounds = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    return rounds[-1] if rounds else None


def _default_src(prefer_local: bool) -> str:
    local = os.path.join(REPO, "BENCH_local.json")
    if prefer_local and os.path.exists(local):
        return local
    newest = _newest_round_artifact()
    if newest:
        return newest
    if os.path.exists(local):
        return local
    sys.exit("no BENCH_*.json found")


def _merge_detail(bench: dict, line: str) -> None:
    """Fold a ``{"detail": true, ...}`` JSON line into the headline
    dict (headline keys win on collision)."""
    try:
        d = json.loads(line)
    except (json.JSONDecodeError, ValueError):
        return
    if isinstance(d, dict) and d.get("detail"):
        for k, v in d.items():
            if k != "detail":
                bench.setdefault(k, v)


def _merge_detail_file(bench: dict) -> None:
    """Since round 9 the bulky detail dict lives in a committed
    ``BENCH_DETAIL_r{N}.json`` referenced by a short stdout pointer
    line — fold that file in (headline keys win)."""
    name = bench.pop("detail_file", None)
    if not name:
        return
    p = name if os.path.isabs(name) else os.path.join(REPO, name)
    if not os.path.exists(p):
        return
    try:
        with open(p) as f:
            d = json.load(f)
    except (json.JSONDecodeError, ValueError):
        return
    for k, v in d.items():
        if k != "detail":
            bench.setdefault(k, v)


def load_bench(src: str) -> dict:
    with open(src) as f:
        text = f.read()
    # driver artifact: {"n": ..., "parsed": {...}, "tail": "..."}
    try:
        obj = json.loads(text)
    except (json.JSONDecodeError, ValueError):
        obj = None
    if isinstance(obj, dict) and "parsed" in obj:
        bench = dict(obj["parsed"] or {})
        # the detail line precedes the headline in the tail; recover it
        # if the capture window kept its opening brace
        tail = obj.get("tail") or ""
        m = re.search(r'\{"detail": true.*?\}(?=\s*\n)', tail, re.DOTALL)
        if m:
            _merge_detail(bench, m.group(0))
        m = re.search(r'"detail_file": "([^"]+)"', tail)
        if m:
            bench.setdefault("detail_file", m.group(1))
        _merge_detail_file(bench)
        if not bench:
            sys.exit(f"{src} has parsed:null and no recoverable headline")
        return bench
    if isinstance(obj, dict):
        return obj  # legacy single-dict local capture
    # raw bench stdout: JSON line(s) — detail-pointer/detail first,
    # headline last
    bench: dict = {}
    lines = [ln for ln in text.splitlines() if ln.strip()]
    for ln in reversed(lines):
        try:
            d = json.loads(ln)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(d, dict) and d.get("detail"):
            _merge_detail(bench, ln)
        elif isinstance(d, dict):
            # headline line (parsed first, from the tail) or the short
            # detail-pointer line — setdefault keeps headline keys
            for k, v in d.items():
                bench.setdefault(k, v)
    _merge_detail_file(bench)
    if not bench:
        sys.exit(f"could not parse any JSON line from {src}")
    return bench


def _operating_point_range() -> dict | None:
    """Min/max of per-run extended-curve argmax throughputs across ALL
    committed curve-bearing artifacts (BENCH_DETAIL_r*, BENCH_local*,
    BENCH_DETAIL_local), plus the knee-region floor — the smallest
    files/trigger any run's argmax landed on. Returns None when fewer
    than two runs carry an extended curve."""
    argmaxes: list[tuple[int, float]] = []  # (files_per_trigger, sps)
    pats = ("BENCH_DETAIL_r*.json", "BENCH_DETAIL_local.json", "BENCH_local*.json")
    for pat in pats:
        for p in glob.glob(os.path.join(REPO, pat)):
            try:
                with open(p) as f:
                    d = json.load(f)
            except (json.JSONDecodeError, OSError, ValueError):
                continue
            ext = (d.get("streaming_ingest_batch_size_curve_ext") or {}).get(
                "points"
            ) or {}
            pts = {
                int(k): float(v["samples_per_sec"])
                for k, v in ext.items()
                if isinstance(v, dict) and "samples_per_sec" in v
            }
            if pts:
                k_best = max(pts, key=lambda k: pts[k])
                argmaxes.append((k_best, pts[k_best]))
    if len(argmaxes) < 2:
        return None
    return {
        "n_runs": len(argmaxes),
        "lo": min(s for _, s in argmaxes),
        "hi": max(s for _, s in argmaxes),
        "knee_files": min(k for k, _ in argmaxes),
    }


def render(b: dict, src_name: str) -> str:
    rnd = re.search(r"r(\d+)", src_name)
    origin = (
        f"round-{int(rnd.group(1))} driver artifact `{src_name}`"
        if rnd
        else f"local re-measure `{src_name}`"
    )
    lines = [
        f"Measured numbers below are from the {origin} "
        f"(sf{b.get('sf')}, local[32]):",
        "",
        f"- **Headline catalog**: {b['value']} s across "
        f"{len(b.get('queries', {}))} representative queries.",
    ]
    ing = b.get("ingest_samples_per_sec")
    if ing:
        lines.append(
            f"- **Five-table batch ingest**: {ing / 1e6:.1f}M samples/s "
            f"({b.get('ingest_five_tables_sec')} s) vs the reference's fixed "
            f"{b.get('reference_samples_per_sec', 30000) / 1e3:.0f}k samples/s "
            f"— ≈{round(ing / b.get('reference_samples_per_sec', 30000)):,}×."
        )
    sps = b.get("streaming_ingest_samples_per_sec")
    if sps:
        lines.append(
            f"- **Exactly-once streaming ingest**: {sps / 1e6:.1f}M samples/s "
            f"at the default micro-batch size."
        )
    op = b.get("streaming_ingest_operating_point_samples_per_sec")
    opt = b.get("streaming_operating_point_files_per_trigger")
    if op:
        # The knee is a REGION, not a point: the 256-vs-512 argmax flips
        # sign inside box noise run-to-run (three committed runs
        # quantify it), so the honest operating-point figure is the
        # min–max of per-run argmaxes across committed curve artifacts,
        # with this run's own argmax beside it.
        rng = _operating_point_range()
        range_txt = (
            f" Across {rng['n_runs']} committed curve artifacts the "
            f"per-run argmax spans {rng['lo'] / 1e6:.1f}–"
            f"{rng['hi'] / 1e6:.1f}M samples/s, argmax always in the "
            f"≥{rng['knee_files']} files/trigger region."
            if rng
            else ""
        )
        lines.append(
            f"- **Streaming ingest at the operating point**: knee region "
            f"≥{min(int(opt), 256)} files/trigger; this run's curve argmax "
            f"{op / 1e6:.1f}M samples/s at {opt} files/trigger (the "
            f"default-trigger number above is the latency-biased config)."
            + range_txt
        )
    curve = b.get("streaming_ingest_batch_size_curve")
    if curve:
        pts = ", ".join(
            f"{k} files/trigger → {v['samples_per_sec'] / 1e6:.1f}M/s"
            for k, v in sorted(curve.items(), key=lambda kv: int(kv[0]))
        )
        lines.append(f"- **Streaming micro-batch size curve**: {pts}.")
    ext = b.get("streaming_ingest_batch_size_curve_ext") or {}
    if ext.get("points"):
        pts = ", ".join(
            f"{k} files/trigger → {v['samples_per_sec'] / 1e6:.1f}M/s"
            for k, v in sorted(ext["points"].items(), key=lambda kv: int(kv[0]))
        )
        lines.append(
            f"- **Extended curve ({ext.get('stage_files')} same-shaped "
            f"files staged)**: {pts}."
        )
    fp = b.get("flagship_prune")
    if fp:
        lines.append(
            f"- **Flagship read pruning**: {fp['partitions_read']}/"
            f"{fp['partitions_total']} partitions, {fp['files_read']} files "
            f"read for the 6-hour/2-meter range query "
            f"({fp['rows_out']:,} rows)."
        )
    ivf = b.get("ivf_prune")
    if ivf:
        lines.append(
            f"- **IVF layout pruning**: {ivf['partitions_read']}/"
            f"{ivf['partitions_total']} cells, {ivf['files_read']} files read "
            f"for a 4-probe ANN scan ({ivf['rows_out']:,} rows)."
        )
    pq = b.get("pq_io")
    if pq:
        lines.append(
            f"- **PQ candidate-scan reduction**: encoded table "
            f"{pq['codes_bytes']:,} B vs embeddings "
            f"{pq['embeddings_bytes']:,} B on disk — "
            f"{pq['scan_reduction']}× less IO for ADC scoring."
        )
    lsh = b.get("lsh_hi_candidate_pruning")
    if lsh:
        lines.append(
            f"- **LSH dedup pruning (cos ≥ 0.8, 16×8)**: candidate fraction "
            f"{lsh['candidate_fraction']:.2%} of all pairs "
            f"({lsh['n_candidates']:,} of {lsh['n_pairs']:,})."
        )
    trn = b.get("ann_train_sec")
    if trn:
        pts = ", ".join(f"{k} {v} s" for k, v in sorted(trn.items()))
        lines.append(
            f"- **ANN train/index builds (paid once per corpus)**: {pts}."
        )
    scale = b.get("scale_path_queries")
    if scale:
        pts = ", ".join(f"`{k}` {v} s" for k, v in sorted(scale.items()))
        lines.append(f"- **Scale-path queries**: {pts}.")
    if b.get("contended"):
        lines.append(
            "- **CONTENDED RUN**: the bench's own tripwire flagged box "
            "contention — treat absolute timings as upper bounds."
        )
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=None)
    ap.add_argument(
        "--local",
        action="store_true",
        help="prefer BENCH_local.json over the newest BENCH_r*.json",
    )
    args = ap.parse_args()
    src = args.src or _default_src(args.local)
    bench = load_bench(src)
    readme_path = os.path.join(REPO, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    begin = readme.index(BEGIN)
    begin = readme.index("-->", begin) + 3
    end = readme.index(END)
    block = "\n" + render(bench, os.path.basename(src)) + "\n"
    with open(readme_path, "w") as f:
        f.write(readme[:begin] + block + readme[end:])
    print(f"README.md bench block regenerated from {os.path.basename(src)}")


if __name__ == "__main__":
    main()
