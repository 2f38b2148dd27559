"""View-dependent result plots (/root/reference/plot_views.py:58-124):
rendered-view PSNR/SSIM vs bpp for uniform / view-gradient / ROI
quality allocations."""

from __future__ import annotations

import os
from typing import Sequence

import pandas as pd


def plot_view_dep(csv_path: str, out_dir: str,
                  metrics: Sequence[str] = ("psnr", "ssim")):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = pd.read_csv(csv_path, index_col=0)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for seq in sorted(df["sequence"].unique()):
        d = df[df["sequence"] == seq]
        for metric in metrics:
            fig, ax = plt.subplots(figsize=(6, 4.5))
            for key in ("uniform", "view", "roi"):
                sel = d[d["key"] == key].sort_values("bpp")
                if len(sel) == 0:
                    continue
                ax.plot(sel["bpp"], sel[metric], marker="o", label=key)
            ax.set_xlabel("bpp")
            ax.set_ylabel(f"rendered-view {metric.upper()}")
            ax.set_title(seq)
            ax.grid(alpha=0.3)
            ax.legend()
            path = os.path.join(out_dir, f"view_{metric}_{seq}.pdf")
            fig.savefig(path, bbox_inches="tight")
            plt.close(fig)
            written.append(path)
    return written
