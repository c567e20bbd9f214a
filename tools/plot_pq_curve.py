#!/usr/bin/env python
"""Recall-vs-latency Pareto figure from pq_recall_curve.py JSON output.

Connected scatter: one line per (loss, m) configuration, points at the
candidate depths, x = ms/query (on-chip scan + host rescore), y = recall@10
after rescore vs the exact fp32 oracle. Colors: isotropic = blue, anisotropic
= orange (fixed categorical order); marker shape encodes m as a secondary
(CVD-safe) channel. Emits PNG (report preview) and PDF (LaTeX include).

Usage:
  python tools/plot_pq_curve.py results/pq_recall/curve_tpu_4m.json \
      results/pq_recall/curve_tpu_4m_aniso.json \
      --out report/paper/figures/pq_curve_4m
"""
from __future__ import annotations

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

ISO, ANISO = "#2a78d6", "#eb6834"  # categorical slots 1-2, fixed order
INK, INK2 = "#0b0b0b", "#52514e"
MARKERS = {12: "o", 16: "s", 24: "^"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--out", default="report/paper/figures/pq_curve_4m")
    ap.add_argument("--min-cand", type=int, default=200,
                    help="drop cells below this cand (cand=100 cells exist "
                    "only for the iso grid; keep the comparison apples-even)")
    args = ap.parse_args()

    rows = []
    for f in args.files:
        rows.extend(json.load(open(f)))
    rows = [r for r in rows if r["cand"] >= args.min_cand]
    # Two cells carry timing artifacts (transient tunnel contention /
    # resume-warm cache; recall values are valid, latencies are not —
    # flagged in results/RESULTS_TPU.md). Median scan_ms across the grid's
    # same-m cells is within ±6%, so exclude rather than impute.
    def _artifact(r):
        sib = [s["scan_ms"] for s in rows
               if s["m"] == r["m"] and s is not r and s["scan_ms"] > 1.0]
        med = sorted(sib)[len(sib) // 2] if sib else r["scan_ms"]
        return r["scan_ms"] < 1.0 or r["scan_ms"] > 1.3 * med
    dropped = [r for r in rows if _artifact(r)]
    for r in dropped:
        print(f"dropped timing-artifact cell: m={r['m']} c={r['coarse']} "
              f"cand={r['cand']} scan_ms={r['scan_ms']}")
    rows = [r for r in rows if not _artifact(r)]

    series = {}  # (aniso, m) -> [(ms, recall, cand)]
    for r in rows:
        key = (r.get("aniso_eta", 0.0) > 0.0, r["m"], r["coarse"])
        series.setdefault(key, []).append(
            (r["ms_per_query"], r["recall_host"], r["cand"]))

    fig, ax = plt.subplots(figsize=(5.4, 3.6), dpi=200)
    fig.patch.set_facecolor("white")
    ax.set_facecolor("white")

    seen = set()
    for (aniso, m, coarse), pts in sorted(series.items()):
        pts.sort(key=lambda p: p[2])  # order along the cand lever
        color = ANISO if aniso else ISO
        ls = "-" if coarse == 2048 else (0, (4, 2))
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        label = f"{'aniso' if aniso else 'iso'} m={m}"
        ax.plot(xs, ys, color=color, linewidth=2, linestyle=ls,
                marker=MARKERS[m],
                markersize=7, markerfacecolor=color,
                markeredgecolor="white", markeredgewidth=1.2,
                label=label if label not in seen else None,
                alpha=0.95, zorder=3)
        seen.add(label)

    # direct labels: one per (loss, m) family, at its rightmost point
    fams = {}
    for (aniso, m, coarse), pts in series.items():
        best = max(pts)
        cur = fams.get((aniso, m))
        if cur is None or best[0] > cur[0]:
            fams[(aniso, m)] = best
    for (aniso, m), (x, y, c) in fams.items():
        ax.annotate(f"{'aniso' if aniso else 'iso'} m={m}",
                    (x, y), textcoords="offset points", xytext=(6, -2),
                    fontsize=8, color=INK)

    ax.set_xlabel("latency (ms/query, scan + rescore)", fontsize=9,
                  color=INK)
    ax.set_ylabel("recall@10 after rescore", fontsize=9, color=INK)
    ax.tick_params(labelsize=8, colors=INK2, length=0)
    ax.grid(True, color="#e8e7e3", linewidth=0.7, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    ax.legend(fontsize=8, frameon=False, loc="lower right", ncol=2)
    ax.set_title("Residual-PQ operating points, 4M×384, TPU v5e\n"
                 "(cand 200→400 along each line; solid c=2048, dashed "
                 "c=4096)", fontsize=9, color=INK)
    fig.tight_layout()
    for ext in ("png", "pdf"):
        fig.savefig(f"{args.out}.{ext}", bbox_inches="tight")
        print(f"wrote {args.out}.{ext}")


if __name__ == "__main__":
    main()
