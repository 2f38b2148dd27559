"""External codec anchors: G-PCC (tmc3), V-PCC (tmc2), PCQM drivers.

Subprocess drivers mirroring /root/reference/utils.py:476-619
(compress_related) and :290-344 (pcqm). The binaries are external MPEG/
MEPP tools; every driver is gated on binary presence so the harness
degrades gracefully in hermetic environments (the reference hard-codes
``./dependencies/...`` paths and crashes without them).
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import tempfile
import time
from typing import Dict, Optional

import numpy as np

from ..data.ply import read_ply, write_ply

TMC3_ENV = "LCPCGA_TMC3"
TMC2_DIR_ENV = "LCPCGA_TMC2_DIR"
PCQM_ENV = "LCPCGA_PCQM"

_DEFAULTS = {
    TMC3_ENV: "dependencies/mpeg-pcc-tmc13/build/tmc3/tmc3",
    TMC2_DIR_ENV: "dependencies/mpeg-pcc-tmc2/bin",
    PCQM_ENV: "dependencies/PCQM/build/PCQM",
}


def find_binary(env_key: str) -> Optional[str]:
    path = os.environ.get(env_key, _DEFAULTS[env_key])
    if env_key == TMC2_DIR_ENV:
        return path if os.path.isdir(path) else None
    if os.path.isfile(path) and os.access(path, os.X_OK):
        return path
    which = shutil.which(os.path.basename(path))
    return which


def have_gpcc() -> bool:
    return find_binary(TMC3_ENV) is not None


def have_pcqm() -> bool:
    return find_binary(PCQM_ENV) is not None


def gpcc_roundtrip(coords: np.ndarray, colors: np.ndarray, qp: Dict,
                   workdir: Optional[str] = None) -> Dict:
    """G-PCC octree+RAHT encode/decode at the given quantization
    parameters (argument set of /root/reference/utils.py:504-567).

    qp: {"positionQuantizationScale": float, "qp": int}.
    Returns {coords, colors, bpp, t_enc, t_dec}.
    """
    tmc3 = find_binary(TMC3_ENV)
    if tmc3 is None:
        raise RuntimeError("tmc3 binary not found; set $LCPCGA_TMC3")
    with tempfile.TemporaryDirectory(dir=workdir) as td:
        src = os.path.join(td, "in.ply")
        binp = os.path.join(td, "out.bin")
        rec = os.path.join(td, "rec.ply")
        write_ply(src, coords.astype(np.float64), colors, ascii=True)
        enc_args = [
            tmc3, "--mode=0", "--trisoupNodeSizeLog2=0", "--mergeDuplicatedPoints=1",
            "--neighbourAvailBoundaryLog2=8", "--intra_pred_max_node_size_log2=6",
            f"--positionQuantizationScale={qp.get('positionQuantizationScale', 1)}",
            "--maxNumQtBtBeforeOt=4", "--planarEnabled=1", "--planarModeIdcmUse=0",
            "--convertPlyColourspace=1",
            "--transformType=0", f"--qp={qp.get('qp', 34)}", "--qpChromaOffset=0",
            "--bitdepth=8", "--attribute=color",
            f"--uncompressedDataPath={src}", f"--compressedStreamPath={binp}",
        ]
        t0 = time.time()
        subprocess.run(enc_args, check=True, capture_output=True)
        t_enc = time.time() - t0
        dec_args = [
            tmc3, "--mode=1", "--convertPlyColourspace=1",
            f"--compressedStreamPath={binp}", f"--reconstructedDataPath={rec}",
            "--outputBinaryPly=0",
        ]
        t0 = time.time()
        subprocess.run(dec_args, check=True, capture_output=True)
        t_dec = time.time() - t0
        out = read_ply(rec)
        nbytes = os.path.getsize(binp)
    return {
        "coords": out["points"],
        "colors": out.get("colors"),
        "bpp": nbytes * 8.0 / coords.shape[0],
        "t_compress": t_enc,
        "t_decompress": t_dec,
    }


def have_vpcc() -> bool:
    d = os.environ.get(TMC2_DIR_ENV, _DEFAULTS[TMC2_DIR_ENV])
    return os.path.isfile(os.path.join(d, "PccAppEncoder"))


def vpcc_roundtrip(coords: np.ndarray, colors: np.ndarray, rate: Dict,
                   workdir: Optional[str] = None) -> Dict:
    """V-PCC (tmc2) encode/decode driver (/root/reference/utils.py:568-612).

    rate: {"geomQP": int, "attrQP": int, "occPrecision": int (opt),
    "config_dir": path to tmc2 cfg/ (opt)}. Requires PccAppEncoder /
    PccAppDecoder under $LCPCGA_TMC2_DIR.
    """
    d = os.environ.get(TMC2_DIR_ENV, _DEFAULTS[TMC2_DIR_ENV])
    enc = os.path.join(d, "PccAppEncoder")
    dec = os.path.join(d, "PccAppDecoder")
    if not (os.path.isfile(enc) and os.path.isfile(dec)):
        raise RuntimeError("tmc2 binaries not found; set $LCPCGA_TMC2_DIR")
    cfg_dir = rate.get("config_dir", os.path.join(d, os.pardir, "cfg"))
    with tempfile.TemporaryDirectory(dir=workdir) as td:
        # tmc2 wants a frame-number template in the path
        src = os.path.join(td, "in_%04d.ply")
        write_ply(src % 0, coords.astype(np.float64), colors, ascii=True)
        binp = os.path.join(td, "out.bin")
        rec = os.path.join(td, "rec_%04d.ply")
        enc_args = [
            enc,
            f"--config={os.path.join(cfg_dir, 'common', 'ctc-common.cfg')}",
            f"--config={os.path.join(cfg_dir, 'condition', 'ctc-all-intra.cfg')}",
            f"--uncompressedDataPath={src}",
            f"--compressedStreamPath={binp}",
            "--frameCount=1", "--startFrameNumber=0",
            f"--geometryQP={rate.get('geomQP', 32)}",
            f"--attributeQP={rate.get('attrQP', 42)}",
            "--computeMetrics=0", "--computeChecksum=0",
        ]
        t0 = time.time()
        subprocess.run(enc_args, check=True, capture_output=True)
        t_enc = time.time() - t0
        dec_args = [
            dec,
            f"--compressedStreamPath={binp}",
            f"--reconstructedDataPath={rec}",
            "--computeMetrics=0", "--computeChecksum=0", "--startFrameNumber=0",
        ]
        t0 = time.time()
        subprocess.run(dec_args, check=True, capture_output=True)
        t_dec = time.time() - t0
        out = read_ply(rec % 0)
        nbytes = os.path.getsize(binp)
    return {
        "coords": out["points"],
        "colors": out.get("colors"),
        "bpp": nbytes * 8.0 / coords.shape[0],
        "t_compress": t_enc,
        "t_decompress": t_dec,
    }


def pcqm(ref_ply: str, rec_ply: str, workdir: Optional[str] = None) -> float:
    """PCQM perceptual metric via the MEPP-team binary, argument set of
    /root/reference/utils.py:290-344 (-fq -r 0.004 -knn 20 -rx 2.0)."""
    binary = find_binary(PCQM_ENV)
    if binary is None:
        raise RuntimeError("PCQM binary not found; set $LCPCGA_PCQM")
    proc = subprocess.run(
        [binary, ref_ply, rec_ply, "-fq", "-r", "0.004", "-knn", "20", "-rx", "2.0"],
        capture_output=True, text=True, cwd=workdir or ".",
    )
    for line in proc.stdout.splitlines():
        m = re.search(r"PCQM\s*value\s*is\s*:?\s*([0-9.eE+-]+)", line)
        if m:
            return float(m.group(1))
    raise RuntimeError(f"could not parse PCQM output:\n{proc.stdout}")


def octree_baseline_roundtrip(coords: np.ndarray, colors: np.ndarray,
                              rate: Dict) -> Dict:
    """In-framework anchor codec: octree-coded downsampled geometry +
    nearest-neighbor colors, Morton-delta + zlib color coding.

    Stands in for the G-PCC anchor sweep when no tmc3 binary exists in
    the environment (zero egress; VERDICT r4 next-round #5). Rate
    points: ``scale`` (geometry downsample stride, 1 = lossless
    geometry) and ``color_bits`` (uniform color quantization, <= 8).
    Uses the SAME in-loop neighbor-context octree coder the learned
    codec transmits latent coordinates with (coding/cpp/coder.cpp), so
    geometry rate is honest; color residuals are Morton-ordered deltas
    through zlib (a DEFLATE stand-in for RAHT — weaker than G-PCC,
    which the BD tables must state).
    """
    import zlib

    from scipy.spatial import cKDTree

    from ..coding import octree_decode, octree_encode

    scale = int(rate.get("scale", 1))
    color_bits = int(rate.get("color_bits", 8))
    depth = int(rate.get("depth", 10))

    t0 = time.perf_counter()
    qc = np.unique(coords // scale, axis=0)
    d = depth - max(0, scale.bit_length() - 1)
    geo_payload = octree_encode(qc.astype(np.int32), d)

    # Reconstruction coordinate order = decoder order (Morton).
    rec_q = octree_decode(geo_payload, d, max(4096, qc.shape[0] * 2))
    rec_coords = rec_q * scale + scale // 2 if scale > 1 else rec_q

    # Nearest-color transfer at the encoder, quantize, delta in the
    # decoder's canonical (Morton / breadth-first octree) order.
    tree = cKDTree(coords)
    _, idx = tree.query(rec_coords.astype(np.float32), k=1, workers=-1)
    c8 = np.clip(np.round(colors[idx] * 255.0), 0, 255).astype(np.int32)
    q = 8 - color_bits
    cq = c8 >> q
    deltas = np.diff(cq, axis=0, prepend=np.zeros((1, 3), cq.dtype))
    # mod-256 wrap: deltas span [-255, 255] at 8 bits; uint8 wrap is
    # exact under mod-256 cumsum on the decoder.
    color_payload = zlib.compress((deltas & 0xFF).astype(np.uint8).tobytes(), 9)
    t1 = time.perf_counter()

    # Decode: octree + zlib + prefix-sum (deltas) + dequantize.
    rq = octree_decode(geo_payload, d, max(4096, qc.shape[0] * 2))
    rc = rq * scale + scale // 2 if scale > 1 else rq
    dd = np.frombuffer(zlib.decompress(color_payload), np.uint8).reshape(-1, 3)
    cq_dec = np.cumsum(dd.astype(np.int64), axis=0) & 0xFF
    rec_colors = (
        ((cq_dec << q) + (1 << q) / 2 if q else cq_dec)
    ).astype(np.float32) / 255.0
    t2 = time.perf_counter()

    n_bytes = len(geo_payload) + len(color_payload) + 8
    return {
        "coords": rc.astype(np.int32),
        "colors": np.clip(rec_colors, 0.0, 1.0),
        "bpp": n_bytes * 8.0 / coords.shape[0],
        "t_compress": t1 - t0,
        "t_decompress": t2 - t1,
    }
