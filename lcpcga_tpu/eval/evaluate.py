"""Evaluation harness: rate-point sweeps -> reference-compatible CSV.

Re-design of /root/reference/evaluate.py (run_testset): for each
experiment x test frame x (q_a, q_g) grid point, run the real
compress -> decompress path, score D1/YUV metrics (native KD-tree
implementation instead of PccAppMetrics subprocess + stdout parsing,
/root/reference/utils.py:206-288) and optionally PCQM / G-PCC anchors
when their binaries exist. CSV columns match results/Ours/test.csv so
the reference's plotting stack (and ours) can consume either.

The p2p convention note: the CSV stores MPEG-style squared-distance
MSE (sum over axes) and PSNR = 10log10(3*res^2 / mse); our
PointCloudMetric returns per-axis means (reference metric.py quirk),
so mse columns are scaled by 3 — PSNRs are identical either way.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..codec_runtime import PointCloudCodec
from ..data.ply import write_ply
from .anchors import (
    gpcc_roundtrip,
    have_gpcc,
    have_pcqm,
    have_vpcc,
    pcqm,
    vpcc_roundtrip,
)
from .metrics import PointCloudMetric

CSV_COLUMNS = [
    "AB_p2p_mse", "AB_p2p_psnr", "AB_y_mse", "AB_u_mse", "AB_v_mse",
    "AB_y_psnr", "AB_u_psnr", "AB_v_psnr", "AB_yuv_psnr", "AB_yuv_mse",
    "BA_p2p_mse", "BA_p2p_psnr", "BA_y_mse", "BA_u_mse", "BA_v_mse",
    "BA_y_psnr", "BA_u_psnr", "BA_v_psnr", "BA_yuv_psnr", "BA_yuv_mse",
    "sym_p2p_mse", "sym_p2p_psnr", "sym_d2_mse", "sym_d2_psnr",
    "sym_y_mse", "sym_u_mse", "sym_v_mse", "sym_y_psnr", "sym_u_psnr",
    "sym_v_psnr", "sym_yuv_psnr", "sym_yuv_mse", "pcqm", "bpp",
    "sequence", "frameIdx", "t_compress", "t_decompress", "q_a", "q_g",
]


def default_q_grid(steps: int = 21) -> List[Tuple[float, float]]:
    """The 21x21 (q_a, q_g) sweep of /root/reference/evaluate.py:71-73."""
    qs = np.round(np.linspace(0.0, 1.0, steps), 3)
    return [(float(qa), float(qg)) for qa in qs for qg in qs]


def metrics_to_row(res: Dict[str, float]) -> Dict[str, float]:
    row = {}
    for d in ("AB", "BA"):
        row[f"{d}_p2p_mse"] = res[f"{d}_mse"] * 3.0
        row[f"{d}_p2p_psnr"] = res[f"{d}_psnr_mse"]
        for ch in "yuv":
            row[f"{d}_{ch}_mse"] = res[f"{d}_{ch}_mse"]
            row[f"{d}_{ch}_psnr"] = res[f"{d}_{ch}_psnr"]
        row[f"{d}_yuv_mse"] = res[f"{d}_yuv_mse"]
        row[f"{d}_yuv_psnr"] = res[f"{d}_yuv_psnr"]
    row["sym_p2p_mse"] = res["sym_mse"] * 3.0
    row["sym_p2p_psnr"] = res["sym_psnr_mse"]
    row["sym_d2_mse"] = res.get("sym_d2_mse", 0.0)
    row["sym_d2_psnr"] = res.get("sym_d2_psnr", 0.0)
    for ch in "yuv":
        row[f"sym_{ch}_mse"] = res[f"sym_{ch}_mse"]
        row[f"sym_{ch}_psnr"] = res[f"sym_{ch}_psnr"]
    row["sym_yuv_mse"] = res["sym_yuv_mse"]
    row["sym_yuv_psnr"] = res["sym_yuv_psnr"]
    return row


class TestsetRunner:
    """Incremental-CSV evaluation loop (/root/reference/evaluate.py:55-216)."""

    __test__ = False  # not a pytest class despite the name

    def __init__(self, out_dir: str, resolution: int = 1023,
                 use_pcqm: Optional[bool] = None):
        self.out_dir = out_dir
        self.resolution = resolution
        self.use_pcqm = have_pcqm() if use_pcqm is None else use_pcqm
        os.makedirs(out_dir, exist_ok=True)
        self.rows: List[Dict] = []

    def _append_row(self, csv_path: str, row: Dict) -> None:
        """Incremental CSV append (the reference appends too,
        /root/reference/evaluate.py:213-216; rewriting the whole file per
        rate point is O(n^2) over a 3528-row sweep). The FIRST row of a
        run truncates the file so a leftover CSV from an earlier run
        can't be extended with mixed rows / duplicate indices."""
        first = len(self.rows) <= 1
        df = pd.DataFrame([row], index=[len(self.rows) - 1])
        df.to_csv(csv_path, mode="w" if first else "a", header=first)

    def _score(self, src_coords, src_colors, rec_coords, rec_colors) -> Dict:
        metric = PointCloudMetric(src_coords, src_colors, rec_coords, rec_colors,
                                  resolution=self.resolution)
        res, _ = metric.compute_pointcloud_metrics(drop_duplicates=False)
        row = metrics_to_row(res)
        if self.use_pcqm:
            ref_ply = os.path.join(self.out_dir, "_ref.ply")
            rec_ply = os.path.join(self.out_dir, "_rec.ply")
            write_ply(ref_ply, src_coords.astype(np.float64), src_colors)
            write_ply(rec_ply, rec_coords.astype(np.float64), rec_colors)
            try:
                row["pcqm"] = pcqm(ref_ply, rec_ply)
            except Exception:
                row["pcqm"] = float("nan")
        else:
            row["pcqm"] = float("nan")
        return row

    def run_ours(
        self,
        codec: PointCloudCodec,
        frames: Iterable[Dict],
        q_grid: Iterable[Tuple[float, float]],
        experiment: str = "Ours",
        save_streams: bool = False,
    ) -> pd.DataFrame:
        csv_path = os.path.join(self.out_dir, "test.csv")
        for frame in frames:
            coords = frame["points"].astype(np.int32)
            colors = frame["colors"].astype(np.float32)
            for (q_a, q_g) in q_grid:
                path = (
                    os.path.join(self.out_dir, f"{frame['sequence']}_{q_g}_{q_a}.bin")
                    if save_streams else None
                )
                t0 = time.perf_counter()
                try:
                    stream, _ = codec.compress(coords, colors, (q_g, q_a),
                                               path=path, return_debug=False)
                    t1 = time.perf_counter()
                    rec_coords, rec_colors = codec.decompress(stream)
                    t2 = time.perf_counter()
                except RuntimeError as e:
                    if "overflow" not in str(e):
                        raise
                    # A strict-capacity overflow at one rate point must
                    # not kill an unattended sweep; record and continue.
                    print(f"[sweep] OVERFLOW {frame.get('sequence')} "
                          f"q=({q_g},{q_a}): {e}", flush=True)
                    continue
                row = self._score(coords, colors, rec_coords, rec_colors)
                row.update(
                    bpp=len(stream.to_bytes()) * 8.0 / coords.shape[0],
                    sequence=frame.get("sequence", "?"),
                    frameIdx=frame.get("frame", 0),
                    t_compress=t1 - t0,
                    t_decompress=t2 - t1,
                    q_a=q_a,
                    q_g=q_g,
                )
                self.rows.append(row)
                self._append_row(csv_path, row)
        return pd.DataFrame(self.rows)

    def run_vpcc(self, frames: Iterable[Dict], rates: Iterable[Dict],
                 experiment: str = "V-PCC") -> pd.DataFrame:
        """V-PCC anchor sweep (/root/reference/evaluate.py:89-91,112-116;
        rate points are tmc2 geometry/attribute QP pairs)."""
        if not have_vpcc():
            raise RuntimeError("tmc2 not available (set $LCPCGA_TMC2_DIR)")
        csv_path = os.path.join(self.out_dir, "test.csv")
        for frame in frames:
            coords = frame["points"].astype(np.int32)
            colors = frame["colors"].astype(np.float32)
            for rate in rates:
                r = vpcc_roundtrip(coords, colors, rate)
                row = self._score(coords, colors, r["coords"], r["colors"])
                row.update(
                    bpp=r["bpp"], sequence=frame.get("sequence", "?"),
                    frameIdx=frame.get("frame", 0),
                    t_compress=r["t_compress"], t_decompress=r["t_decompress"],
                    q_a=rate.get("attrQP", 0), q_g=rate.get("geomQP", 0),
                )
                self.rows.append(row)
                self._append_row(csv_path, row)
        return pd.DataFrame(self.rows)

    def run_octree_baseline(self, frames: Iterable[Dict],
                            rates: Iterable[Dict],
                            experiment: str = "OctreeNN") -> pd.DataFrame:
        """In-framework anchor sweep (octree geometry + nearest-color,
        eval/anchors.octree_baseline_roundtrip) — the BD anchor when no
        tmc3/tmc2 binary exists in the environment. Rate points:
        {scale, color_bits, depth}."""
        from .anchors import octree_baseline_roundtrip

        csv_path = os.path.join(self.out_dir, "test.csv")
        for frame in frames:
            coords = frame["points"].astype(np.int32)
            colors = frame["colors"].astype(np.float32)
            for rate in rates:
                r = octree_baseline_roundtrip(coords, colors, rate)
                row = self._score(coords, colors, r["coords"], r["colors"])
                row.update(
                    bpp=r["bpp"], sequence=frame.get("sequence", "?"),
                    frameIdx=frame.get("frame", 0),
                    t_compress=r["t_compress"], t_decompress=r["t_decompress"],
                    q_a=rate.get("color_bits", 8), q_g=rate.get("scale", 1),
                )
                self.rows.append(row)
                self._append_row(csv_path, row)
        return pd.DataFrame(self.rows)

    def run_gpcc(self, frames: Iterable[Dict], qps: Iterable[Dict],
                 experiment: str = "G-PCC") -> pd.DataFrame:
        if not have_gpcc():
            raise RuntimeError("tmc3 not available")
        csv_path = os.path.join(self.out_dir, "test.csv")
        for frame in frames:
            coords = frame["points"].astype(np.int32)
            colors = frame["colors"].astype(np.float32)
            for qp in qps:
                r = gpcc_roundtrip(coords, colors, qp)
                row = self._score(coords, colors, r["coords"], r["colors"])
                row.update(
                    bpp=r["bpp"], sequence=frame.get("sequence", "?"),
                    frameIdx=frame.get("frame", 0),
                    t_compress=r["t_compress"], t_decompress=r["t_decompress"],
                    q_a=qp.get("qp", 0), q_g=qp.get("positionQuantizationScale", 1),
                )
                self.rows.append(row)
                self._append_row(csv_path, row)
        return pd.DataFrame(self.rows)
