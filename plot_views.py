#!/usr/bin/env python
"""Repo-root wrapper: plot view-dependent results."""
import argparse

from lcpcga_tpu.eval.view_plots import plot_view_dep

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--out", default="./results/plots/views")
    a = ap.parse_args()
    plot_view_dep(a.csv, a.out)
