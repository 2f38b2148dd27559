"""Point cloud quality metrics: D1/Hausdorff PSNR + YUV color PSNR.

Native re-implementation of /root/reference/metrics/metric.py
(PointCloudMetric) without Open3D: scipy cKDTree for NN association,
vectorized duplicate-aware color averaging. Behavioral quirks of the
reference are preserved deliberately because the shipped CSVs/BD
numbers depend on them:

  * "mse" is the per-axis MEAN squared error (squared distance / 3),
    /root/reference/metrics/metric.py:113-119;
  * symmetric metrics take the MIN of the two directions
    (/root/reference/metrics/metric.py:72-82);
  * colors are re-quantized to 8 bit before YUV conversion
    (/root/reference/metrics/metric.py:149-152) with the uint8 BT.709
    path of convert_rgb_to_yuv (:171-190).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree

BT709_UINT8 = np.array(
    [
        [0.2126, 0.7152, 0.0722],
        [-0.1146, -0.3854, 0.5],
        [0.5, -0.4542, -0.0458],
    ],
    np.float64,
)


def rgb_to_yuv_uint8(rgb01: np.ndarray) -> np.ndarray:
    """[0,1] float RGB -> YUV in [0,1] through the uint8 path
    (/root/reference/metrics/metric.py:171-190)."""
    rgb = (np.clip(rgb01, 0, 1) * 255).astype(np.uint8).astype(np.float64)
    yuv = rgb @ BT709_UINT8.T
    yuv /= 255.0
    yuv[:, 1] += 0.5
    yuv[:, 2] += 0.5
    return yuv


def _one_direction(
    a_pts, a_cols, b_pts, b_cols, b_tree: cKDTree, resolution: int,
    drop_duplicates: bool, b_normals: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    dists, idx = b_tree.query(a_pts, k=2, workers=-1)
    nn = idx[:, 0]
    # Per-axis mean squared error of the nearest neighbor (reference quirk).
    diff = a_pts - b_pts[nn]
    l2 = (diff * diff).mean(axis=1)
    out = {
        "mse": float(l2.mean()),
        "hausdorff": float(l2.max()),
    }
    out["psnr_mse"] = 10 * np.log10(resolution**2 / max(out["mse"], 1e-20))
    out["psnr_hausdorff"] = 10 * np.log10(resolution**2 / max(out["hausdorff"], 1e-20))

    if b_normals is not None:
        # D2 point-to-plane: error projected onto the reference normal
        # (MPEG PccAppMetrics convention; same /3 scaling as D1 so the
        # PSNR formula matches the CSV columns).
        proj = (diff * b_normals[nn]).sum(axis=1)
        d2 = (proj * proj) / 3.0
        out["d2_mse"] = float(d2.mean())
        out["d2_psnr"] = 10 * np.log10(resolution**2 / max(out["d2_mse"], 1e-20))

    b_cols_ordered = b_cols[nn].copy()
    if not drop_duplicates:
        # Points whose two nearest neighbors are equidistant: average the
        # colors of ALL equidistant neighbors
        # (/root/reference/metrics/metric.py:124-146).
        d1 = dists[:, 0] ** 2
        d2 = dists[:, 1] ** 2
        dup = np.abs(d1 - d2) < 1e-8
        if np.any(dup):
            kk = min(30, b_pts.shape[0])
            dd, ii = b_tree.query(a_pts[dup], k=kk, workers=-1)
            same = np.abs(dd**2 - d1[dup][:, None]) < 1e-8
            # average colors over equidistant neighbors (plus the first
            # occurrence again, matching the reference's n+1 denominator)
            counts = same.sum(axis=1)
            csum = np.zeros((dup.sum(), 3))
            for c in range(3):
                vals = b_cols[ii.reshape(-1), c].reshape(ii.shape)
                csum[:, c] = (vals * same).sum(axis=1)
            base = b_cols_ordered[dup]
            b_cols_ordered[dup] = (base + csum) / (counts[:, None] + 1)

    a_yuv = rgb_to_yuv_uint8(a_cols)
    b_yuv = rgb_to_yuv_uint8(b_cols_ordered)
    cerr = ((a_yuv - b_yuv) ** 2).mean(axis=0)
    for i, ch in enumerate("yuv"):
        out[f"{ch}_mse"] = float(cerr[i])
        out[f"{ch}_psnr"] = 10 * np.log10(1.0 / max(cerr[i], 1e-20))
    # Combined YUV uses BT.709-ish 6:1:1 weighting on BOTH mse and psnr
    # (independently — the reference CSV obeys both identities exactly;
    # /root/reference/utils.py pc_metrics convention).
    out["yuv_mse"] = float((6 * cerr[0] + cerr[1] + cerr[2]) / 8)
    out["yuv_psnr"] = float(
        (6 * out["y_psnr"] + out["u_psnr"] + out["v_psnr"]) / 8
    )
    return out


class PointCloudMetric:
    """Two-directional association metrics between source and
    reconstruction (API of /root/reference/metrics/metric.py:6-82)."""

    def __init__(
        self,
        source_points: np.ndarray,
        source_colors: np.ndarray,
        recons_points: np.ndarray,
        recons_colors: np.ndarray,
        resolution: int = 1023,
        drop_duplicates: bool = True,
        source_normals: Optional[np.ndarray] = None,
    ):
        if drop_duplicates:
            source_points, si = np.unique(source_points, axis=0, return_index=True)
            source_colors = source_colors[si]
            if source_normals is not None:
                source_normals = source_normals[si]
            recons_points, ri = np.unique(recons_points, axis=0, return_index=True)
            recons_colors = recons_colors[ri]
        self.sp = np.asarray(source_points, np.float64)
        self.sc = np.asarray(source_colors, np.float64)
        self.rp = np.asarray(recons_points, np.float64)
        self.rc = np.asarray(recons_colors, np.float64)
        self.sn = None if source_normals is None else np.asarray(source_normals, np.float64)
        self.resolution = resolution
        self.s_tree = cKDTree(self.sp)
        self.r_tree = cKDTree(self.rp)

    def compute_pointcloud_metrics(self, drop_duplicates: bool = False):
        ab = _one_direction(self.sp, self.sc, self.rp, self.rc, self.r_tree,
                            self.resolution, drop_duplicates)
        ba = _one_direction(self.rp, self.rc, self.sp, self.sc, self.s_tree,
                            self.resolution, drop_duplicates, b_normals=self.sn)
        result = {f"AB_{k}": v for k, v in ab.items()}
        result.update({f"BA_{k}": v for k, v in ba.items()})
        # Symmetric = WORST direction: min for PSNR-like, max for
        # error-like quantities (min-of-PSNR <=> max-of-MSE; verified
        # against /root/reference/results/Ours/test.csv which obeys
        # sym_mse == max(AB, BA) exactly).
        for k in ("psnr_mse", "psnr_hausdorff", "y_psnr", "u_psnr",
                  "v_psnr", "yuv_psnr"):
            result[f"sym_{k}"] = min(ab[k], ba[k])
        for k in ("mse", "hausdorff", "y_mse", "u_mse", "v_mse", "yuv_mse"):
            result[f"sym_{k}"] = max(ab[k], ba[k])
        if self.sn is not None:
            # Only the B->A direction has reference normals; report it as
            # the symmetric D2 (the reference CSV stores zeros without
            # normals, /root/reference/results/Ours/test.csv sym_d2_*).
            result["sym_d2_mse"] = ba["d2_mse"]
            result["sym_d2_psnr"] = ba["d2_psnr"]
        return result, {}
