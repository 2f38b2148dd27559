"""Offline cube-dataset preparation with round-trip verification.

Re-design of /root/reference/data/prepare_dataset.py +
data/utils/Cubes.py/Cube.py (CubeHandler): slice raw frames into
cube_size^3 blocks, verify lossless reassembly, and write the npz
split caches that StaticDataset consumes (the reference writes per-cube
PLYs + side_info.yaml; a single compressed npz per split is strictly
faster to load and hash-verifiable).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
import yaml

from .dataset import RawLoader, parse_frame_range, reassemble_cubes, slice_into_cubes


def prepare_split(
    data_path: str,
    split: str,
    cube_size: int = 128,
    min_points: int = 0,
    verify: bool = True,
) -> str:
    """Materialize {split}.npz from the dataset config; asserts the cube
    round trip is lossless (/root/reference/data/prepare_dataset.py:52-58
    checks mean distance < 1e-10; we check exact set equality)."""
    cfg_path = os.path.join(data_path, "config.yaml")
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    raw_cfg = cfg.get("raw_loading", os.path.join(data_path, "raw_loading.yaml"))
    loader = RawLoader(raw_cfg, cfg.get("data_root", ""))

    partition = split == "train"
    samples: List[Dict] = []
    for entry in cfg[split]:
        seq = entry["sequence"]
        for frame in parse_frame_range(entry.get("frames", 0)):
            sample = loader.load(seq, frame)
            pts = sample["points"].astype(np.int64)
            if partition:
                cubes = slice_into_cubes(pts, sample["colors"], cube_size)
                if verify:
                    back = reassemble_cubes(cubes)
                    a = np.asarray(sorted(map(tuple, back)))
                    b = np.asarray(sorted(map(tuple, pts)))
                    if not np.array_equal(a, b):
                        raise AssertionError(
                            f"cube round-trip mismatch for {seq}:{frame}"
                        )
                for cube in cubes:
                    if cube["points"].shape[0] < min_points:
                        continue
                    cube["sequence"] = seq
                    cube["frame"] = frame
                    samples.append(cube)
            else:
                sample["sequence"] = seq
                sample["frame"] = frame
                samples.append(sample)

    out = os.path.join(data_path, f"{split}.npz")
    np.savez_compressed(out, samples=np.array(samples, dtype=object))
    return out


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Prepare cube dataset caches")
    ap.add_argument("--data", required=True, help="dataset dir with config.yaml")
    ap.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    ap.add_argument("--cube-size", type=int, default=128)
    ap.add_argument("--min-points", type=int, default=0)
    args = ap.parse_args(argv)
    for split in args.splits:
        path = prepare_split(args.data, split, args.cube_size, args.min_points)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
