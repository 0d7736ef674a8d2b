#!/usr/bin/env python
"""Render the scaling-study figure: end-to-end runtime vs sample count N.

The analog of the reference's plotting notebooks (plotting_200k.ipynb
cells 6-7, rendered in its README.md:99-102): our measured TPU runs
(docs/design/scaling_study.json, written by scripts/scaling_study.py)
against the published PyRHE and RHE-mc CPU baselines from BASELINE.md.

Writes docs/design/scaling_study.png. Pure-matplotlib, no notebook.
"""
from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# published baselines (BASELINE.md / plotting_200k.ipynb cell 6):
# 5-worker CPU node, k=10, 1 bin, J=100, ~500k UKBB SNPs
PYRHE_PUB = {10_000: 21.09, 50_000: 103.50, 200_000: 450.53}
RHEMC_PUB = {10_000: 39.95, 50_000: 238.88, 200_000: 845.10}

# palette roles (light surface): series follow entities, text wears ink
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
MUTED = "#898781"
GRID = "#e1e0d9"
BASELINE_AXIS = "#c3c2b7"
SERIES = {"ours": "#2a78d6", "pyrhe": "#eb6834", "rhemc": "#1baf7a"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=os.path.join(
        ROOT, "docs", "design", "scaling_study.json"))
    ap.add_argument("--out", default=os.path.join(
        ROOT, "docs", "design", "scaling_study.png"))
    args = ap.parse_args()

    with open(args.json) as f:
        rows = json.load(f)
    ours = sorted((r["N"], r["phases_s"]["total_after_warmup"], r["M"])
                  for r in rows)

    fig, ax = plt.subplots(figsize=(7.2, 4.4), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    for pub, key, label in ((PYRHE_PUB, "pyrhe", "PyRHE (5-core CPU, pub.)"),
                            (RHEMC_PUB, "rhemc", "RHE-mc C++ (CPU, pub.)")):
        xs, ys = zip(*sorted(pub.items()))
        ax.plot(xs, ys, color=SERIES[key], lw=2, marker="o", ms=6,
                label=label, zorder=2)
        ax.annotate(f"{ys[-1]:.0f}s", (xs[-1], ys[-1]), xytext=(6, -3),
                    textcoords="offset points", fontsize=8, color=INK)

    xs = [n for n, _, _ in ours]
    ys = [t for _, t, _ in ours]
    ax.plot(xs, ys, color=SERIES["ours"], lw=2, marker="o", ms=6,
            label="this work (1 TPU chip)", zorder=3)
    for n, t, m in ours:
        ax.annotate(f"{t:.0f}s (M={m//1000}k)", (n, t), xytext=(6, 4),
                    textcoords="offset points", fontsize=8, color=INK)

    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("individuals N (k=10 probes, J=100 blocks)", color=INK)
    ax.set_ylabel("end-to-end runtime (s)", color=INK)
    ax.set_title("RHE end-to-end runtime vs sample count",
                 color=INK, fontsize=11)
    ax.grid(True, which="major", color=GRID, lw=0.75, zorder=0)
    ax.tick_params(colors=MUTED, labelsize=8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(BASELINE_AXIS)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK, loc="upper left")
    fig.text(0.01, 0.01,
             "published baselines use ~500k SNPs; our rows use the M shown"
             " — see docs/design/scaling_study.md",
             fontsize=7, color=MUTED)
    fig.tight_layout(rect=(0, 0.03, 1, 1))
    fig.savefig(args.out, facecolor=SURFACE)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
