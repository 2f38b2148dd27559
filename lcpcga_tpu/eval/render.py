"""Headless point-cloud renderer (matplotlib point splats).

Replaces the reference's Open3D offscreen Visualizer renders
(/root/reference/utils.py:77-123: 6 axis-aligned views per
reconstruction) with a dependency-light orthographic splatter: z-buffer
resolved by depth sort, one PNG per view.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

VIEWS = {
    "front": (0, 1, 2, +1),
    "back": (0, 1, 2, -1),
    "left": (2, 1, 0, +1),
    "right": (2, 1, 0, -1),
    "top": (0, 2, 1, +1),
    "bottom": (0, 2, 1, -1),
}


def render_views(
    coords: np.ndarray,
    colors: np.ndarray,
    path_template: str,
    views: Sequence[str] = ("front", "left", "top"),
    image_size: int = 800,
    point_size: float = 1.0,
):
    """Write one PNG per view; path_template.format(view)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path_template) or ".", exist_ok=True)
    p = coords.astype(np.float64)
    written = []
    for view in views:
        ax_u, ax_v, ax_d, sign = VIEWS[view]
        order = np.argsort(sign * p[:, ax_d])
        fig = plt.figure(figsize=(image_size / 100, image_size / 100), dpi=100)
        ax = fig.add_axes([0, 0, 1, 1])
        ax.scatter(p[order, ax_u], p[order, ax_v], c=np.clip(colors[order], 0, 1),
                   s=point_size, marker=".", linewidths=0)
        ax.set_aspect("equal")
        ax.axis("off")
        out = path_template.format(view)
        fig.savefig(out)
        plt.close(fig)
        written.append(out)
    return written


def render_image_array(coords, colors, view: str = "front", resolution: int = 1024,
                       image_size: int = 512):
    """Rasterize to an RGB array (for rendered-view PSNR/SSIM in the
    view-dependent evaluation, /root/reference/evaluate_view_dep.py:195-296).

    Orthographic nearest-depth splat onto an image_size^2 grid; empty
    pixels are white (Open3D's default background).
    """
    ax_u, ax_v, ax_d, sign = VIEWS[view]
    p = coords.astype(np.float64)
    u = np.clip((p[:, ax_u] / resolution * image_size).astype(int), 0, image_size - 1)
    v = np.clip((p[:, ax_v] / resolution * image_size).astype(int), 0, image_size - 1)
    d = sign * p[:, ax_d]
    img = np.ones((image_size, image_size, 3), np.float32)
    # nearest point wins: sort far-to-near so near overwrites
    order = np.argsort(-d)
    img[v[order], u[order]] = np.clip(colors[order], 0, 1)
    return img[::-1]  # y up
