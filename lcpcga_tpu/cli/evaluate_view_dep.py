"""View-dependent evaluation CLI
(/root/reference/evaluate_view_dep.py as a parameterized command)."""

from __future__ import annotations

import argparse
import os

from ..data.dataset import StaticDataset, SyntheticCubeDataset
from ..eval.view_dep import run_view_dep
from ..eval.view_plots import plot_view_dep
from .evaluate import load_codec

# The paper's 4 operating points (/root/reference/evaluate_view_dep.py:93-97).
DEFAULT_CONFIGS = [(0.05, 0.1), (0.1, 0.2), (0.2, 0.4), (0.4, 0.8)]


def main(argv=None):
    ap = argparse.ArgumentParser(description="View-dependent Q-map evaluation")
    ap.add_argument("--experiment", required=True)
    ap.add_argument("--results", default="./results")
    ap.add_argument("--data", default=None)
    ap.add_argument("--capacity", type=int, default=1_100_000)
    args = ap.parse_args(argv)

    exp_dir = os.path.join(args.results, args.experiment)
    codec = load_codec(exp_dir, args.capacity)
    if args.data:
        ds = StaticDataset(args.data, split="test", partition=False)
        frames = [ds[i] for i in range(len(ds))]
    else:
        ds = SyntheticCubeDataset(num_samples=1, cube_size=1024, points_per_cube=100_000)
        frames = [ds[i] for i in range(len(ds))]

    out_dir = os.path.join(exp_dir, "view_dep")
    run_view_dep(codec, frames, DEFAULT_CONFIGS, out_dir)
    plot_view_dep(os.path.join(out_dir, "view_dep.csv"), out_dir)
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
