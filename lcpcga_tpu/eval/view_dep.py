"""View-dependent / ROI quality-map evaluation.

Re-design of /root/reference/evaluate_view_dep.py: at each operating
point, compare three spatial quality allocations at matched settings —

  * uniform:   Q = (q_g, q_a) everywhere;
  * view:      Q scaled by a gradient along the viewing axis
               (/root/reference/evaluate_view_dep.py:49-56 tables);
  * roi:       binary cutoff plane (q=0 behind, q=(q_g,q_a) in front).

Scoring is rendered-image YUV PSNR/SSIM of the front view against the
source render (native rasterizer + image metrics; the reference uses
Open3D renders + scikit-image).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..codec_runtime import PointCloudCodec
from .image_metrics import psnr, rgb2yuv_image, ssim
from .render import render_image_array

# Per-sequence gradient (max, min, axis) and cutoff (plane, axis) tables
# (/root/reference/evaluate_view_dep.py:58-77). Callers override for
# their own content; defaults work for front-facing vox10 bodies.
DEFAULT_VIEW_GRAD = (900.0, 100.0, 2)
DEFAULT_CUTOFF = (512.0, 2)


def gradient_qmap(points: np.ndarray, q_g: float, q_a: float,
                  grad: Tuple[float, float, int] = DEFAULT_VIEW_GRAD) -> np.ndarray:
    mx, mn, axis = grad
    score = np.clip((points[:, axis] - mn) / (mx - mn), 0.0, 1.0)
    return np.stack([q_g * score, q_a * score], axis=1).astype(np.float32)


def roi_qmap(points: np.ndarray, q_g: float, q_a: float,
             cutoff: Tuple[float, int] = DEFAULT_CUTOFF) -> np.ndarray:
    plane, axis = cutoff
    score = np.where(points[:, axis] < plane, 0.0, 1.0)
    return np.stack([q_g * score, q_a * score], axis=1).astype(np.float32)


def run_view_dep(
    codec: PointCloudCodec,
    frames: Iterable[Dict],
    configs: List[Tuple[float, float]],
    out_dir: str,
    view: str = "front",
    resolution: int = 1024,
    view_grads: Optional[Dict[str, Tuple[float, float, int]]] = None,
    cut_offs: Optional[Dict[str, Tuple[float, int]]] = None,
) -> pd.DataFrame:
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for frame in frames:
        seq = frame.get("sequence", "?")
        coords = frame["points"].astype(np.int32)
        colors = frame["colors"].astype(np.float32)
        ref_img = rgb2yuv_image(render_image_array(coords, colors, view, resolution))
        grad = (view_grads or {}).get(seq, DEFAULT_VIEW_GRAD)
        cut = (cut_offs or {}).get(seq, DEFAULT_CUTOFF)

        for (q_g, q_a) in configs:
            variants = {
                "uniform": None,
                "view": gradient_qmap(coords, q_g, q_a, grad),
                "roi": roi_qmap(coords, q_g, q_a, cut),
            }
            for key, qmap in variants.items():
                stream, _ = codec.compress(coords, colors, (q_g, q_a), q_map=qmap)
                rc, rcol = codec.decompress(stream)
                img = rgb2yuv_image(render_image_array(rc, rcol, view, resolution))
                rows.append(
                    {
                        "sequence": seq,
                        "key": key,
                        "q_g": q_g,
                        "q_a": q_a,
                        "bpp": len(stream.to_bytes()) * 8.0 / coords.shape[0],
                        "psnr": psnr(ref_img, img),
                        "ssim": ssim(ref_img, img, channel_axis=2),
                    }
                )
                pd.DataFrame(rows).to_csv(os.path.join(out_dir, "view_dep.csv"))
    return pd.DataFrame(rows)
