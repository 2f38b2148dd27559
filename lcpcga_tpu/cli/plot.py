"""Plot CLI (/root/reference/plot.py's plot_experiments as a command)."""

from __future__ import annotations

import argparse

from ..eval.plots import plot_experiments


def main(argv=None):
    ap = argparse.ArgumentParser(description="Plot lcpcga_tpu evaluation results")
    ap.add_argument("--results", default="./results")
    ap.add_argument("--experiments", nargs="+", required=True)
    ap.add_argument("--out", default="./results/plots")
    args = ap.parse_args(argv)
    plot_experiments(args.results, args.experiments, args.out)
    print(f"wrote plots to {args.out}")


if __name__ == "__main__":
    main()
