"""Reporting: RD curves, Pareto fronts, contour maps, BD tables, timing.

Re-design of /root/reference/plot.py + plot/style.py. Consumes the
test.csv schema produced by eval/evaluate.py (same columns as the
reference's results/Ours/test.csv, so either codebase's sweeps plot
through either stack).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from .bjontegaard import bd_psnr, bd_rate

# The paper's 4 operating points (/root/reference/plot.py:31-36).
BD_POINTS: List[Tuple[float, float]] = [(0.05, 0.1), (0.1, 0.2), (0.2, 0.4), (0.4, 0.8)]

STYLE = {
    "figure.figsize": (6, 4.5),
    "axes.grid": True,
    "grid.alpha": 0.3,
    "font.size": 11,
    "lines.linewidth": 1.6,
    "lines.markersize": 5,
}


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rcParams.update(STYLE)
    return plt


def load_results(results_root: str, experiments: Sequence[str]) -> Dict[str, pd.DataFrame]:
    """Load results/<exp>/test.csv, mapping pcqm -> 1 - pcqm so larger is
    better everywhere (/root/reference/plot.py:430-439)."""
    out = {}
    for exp in experiments:
        path = os.path.join(results_root, exp, "test.csv")
        if not os.path.exists(path):
            continue
        df = pd.read_csv(path, index_col=0)
        if "pcqm" in df:
            df["1-pcqm"] = 1.0 - df["pcqm"]
        out[exp] = df
    return out


def pareto_front(df: pd.DataFrame, metric: str = "1-pcqm") -> pd.DataFrame:
    """Rate points not dominated in (bpp, metric)
    (/root/reference/plot.py:407-428)."""
    d = df.sort_values("bpp").reset_index(drop=True)
    best = -np.inf
    keep = []
    for i, row in d.iterrows():
        if row[metric] > best:
            best = row[metric]
            keep.append(i)
    return d.loc[keep]


def select_bd_points(df: pd.DataFrame, points: Sequence[Tuple[float, float]] = BD_POINTS
                     ) -> pd.DataFrame:
    """Filter a sweep to the configured (q_g, q_a) operating points."""
    mask = np.zeros(len(df), bool)
    for qg, qa in points:
        mask |= (np.isclose(df["q_g"], qg) & np.isclose(df["q_a"], qa)).to_numpy()
    return df[mask]


def compute_bd_deltas(
    results: Dict[str, pd.DataFrame],
    anchor: str = "G-PCC",
    metrics: Sequence[str] = ("sym_y_psnr", "sym_p2p_psnr"),
) -> pd.DataFrame:
    """Per-sequence BD-PSNR / BD-rate vs an anchor
    (/root/reference/plot.py:373-402)."""
    rows = []
    if anchor not in results:
        return pd.DataFrame()
    a_df = results[anchor]
    for exp, df in results.items():
        if exp == anchor:
            continue
        pts = select_bd_points(df) if {"q_g", "q_a"}.issubset(df.columns) else df
        for seq in sorted(pts["sequence"].unique()):
            t = pts[pts["sequence"] == seq].sort_values("bpp")
            a = a_df[a_df["sequence"] == seq].sort_values("bpp")
            if len(t) < 4 or len(a) < 4:
                continue
            row = {"experiment": exp, "sequence": seq}
            for m in metrics:
                row[f"bd_psnr_{m}"] = bd_psnr(a["bpp"], a[m], t["bpp"], t[m])
                row[f"bd_rate_{m}"] = bd_rate(a["bpp"], a[m], t["bpp"], t[m])
            rows.append(row)
    return pd.DataFrame(rows)


def plot_rd_curves(
    results: Dict[str, pd.DataFrame],
    out_dir: str,
    metrics: Sequence[str] = ("sym_y_psnr", "sym_p2p_psnr", "1-pcqm"),
    use_bd_points: bool = True,
):
    """Per-sequence RD curves per metric (/root/reference/plot.py:309-370)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    seqs = sorted({s for df in results.values() for s in df["sequence"].unique()})
    written = []
    for metric in metrics:
        for seq in seqs:
            fig, ax = plt.subplots()
            for exp, df in results.items():
                if metric not in df.columns:
                    continue
                d = df[df["sequence"] == seq]
                if {"q_g", "q_a"}.issubset(d.columns) and use_bd_points:
                    sel = select_bd_points(d)
                    d = sel if len(sel) else pareto_front(d, metric)
                d = d.sort_values("bpp")
                if len(d) == 0:
                    continue
                ax.plot(d["bpp"], d[metric], marker="o", label=exp)
            ax.set_xlabel("bpp")
            ax.set_ylabel(metric)
            ax.set_title(seq)
            ax.legend()
            path = os.path.join(out_dir, f"rd_{metric.replace('-', '')}_{seq}.pdf")
            fig.savefig(path, bbox_inches="tight")
            plt.close(fig)
            written.append(path)
    return written


def plot_contours(df: pd.DataFrame, out_dir: str, sequence: str,
                  metrics: Sequence[str] = ("sym_y_psnr", "sym_p2p_psnr", "bpp")):
    """q_a x q_g contour maps over the full grid
    (/root/reference/plot.py:158-221)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    d = df[df["sequence"] == sequence]
    qa = np.sort(d["q_a"].unique())
    qg = np.sort(d["q_g"].unique())
    written = []
    for metric in metrics:
        grid = np.full((len(qg), len(qa)), np.nan)
        for i, g in enumerate(qg):
            for j, a in enumerate(qa):
                v = d[(d["q_g"] == g) & (d["q_a"] == a)][metric]
                if len(v):
                    grid[i, j] = v.iloc[0]
        fig, ax = plt.subplots()
        cs = ax.contourf(qa, qg, grid, levels=15, cmap="viridis")
        fig.colorbar(cs, ax=ax, label=metric)
        ax.set_xlabel("q_a")
        ax.set_ylabel("q_g")
        ax.set_title(f"{sequence}: {metric}")
        path = os.path.join(out_dir, f"contour_{metric}_{sequence}.pdf")
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written


def compute_times(results: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    """Mean +- 95% CI of encode/decode times per experiment
    (/root/reference/plot.py:442-499)."""
    rows = []
    for exp, df in results.items():
        for col in ("t_compress", "t_decompress"):
            vals = df[col].to_numpy()
            mean = vals.mean()
            ci = 1.96 * vals.std(ddof=1) / np.sqrt(len(vals)) if len(vals) > 1 else 0.0
            rows.append({"experiment": exp, "phase": col, "mean_s": mean, "ci95_s": ci})
    return pd.DataFrame(rows)


def plot_experiments(results_root: str, experiments: Sequence[str], out_dir: str,
                     anchor: str = "G-PCC"):
    """Top-level driver (/root/reference/plot.py:107-125)."""
    results = load_results(results_root, experiments)
    os.makedirs(out_dir, exist_ok=True)
    plot_rd_curves(results, os.path.join(out_dir, "rd"))
    deltas = compute_bd_deltas(results, anchor=anchor)
    if len(deltas):
        deltas.to_csv(os.path.join(out_dir, "bd_deltas.csv"), index=False)
    times = compute_times(results)
    times.to_csv(os.path.join(out_dir, "times.csv"), index=False)
    return results
