#!/usr/bin/env python
"""Regenerate README.md's benchmark block from measured bench JSON —
numbers in prose rot (the old hand-ranged paragraph happened to stay
accurate only by luck), so the README quotes the bench artifact
verbatim instead.

Usage::

    python update_readme_bench.py [--src BENCH_xxx.json]

Default source: ``BENCH_local.json`` if present (a clean same-round
re-measure), else the newest ``BENCH_r*.json``. Rewrites the block
between the ``BENCH:BEGIN`` / ``BENCH:END`` markers in README.md.
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


def _default_src() -> str:
    local = os.path.join(REPO, "BENCH_local.json")
    if os.path.exists(local):
        return local
    rounds = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not rounds:
        sys.exit("no BENCH_*.json found")
    return rounds[-1]


def render(b: dict, src_name: str) -> str:
    lines = [
        f"Measured numbers below are from `{src_name}` "
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
    curve = b.get("streaming_ingest_batch_size_curve")
    if curve:
        pts = ", ".join(
            f"{k} files/trigger → {v['samples_per_sec'] / 1e6:.1f}M/s"
            for k, v in sorted(curve.items(), key=lambda kv: int(kv[0]))
        )
        lines.append(f"- **Streaming micro-batch size curve**: {pts}.")
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
    scale = b.get("scale_path_queries")
    if scale:
        pts = ", ".join(f"`{k}` {v} s" for k, v in sorted(scale.items()))
        lines.append(f"- **Scale-path queries**: {pts}.")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=None)
    args = ap.parse_args()
    src = args.src or _default_src()
    with open(src) as f:
        bench = json.load(f)
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
