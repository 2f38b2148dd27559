"""Datasets: raw PLY loading, cube slicing, split caching, batching.

Re-design of /root/reference/data/dataloader.py (StaticDataset),
/root/reference/data/utils/RawLoader.py and
/root/reference/data/utils/util.py (collation). Host side is numpy; the
"collation" step produces padded [B, N, ...] arrays — the TPU-native
equivalent of ME's sparse_collate (/root/reference/train.py:185-187).

Dataset config schema mirrors the reference
(/root/reference/data/datasets/full_128/config.yaml): per-split lists
of {sequence, frames "start:end:stride"} resolved through a raw-loading
YAML of path templates.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import yaml

from .ply import read_ply
from .synthetic import surface_cloud
from .transform import Compose


def parse_frame_range(spec) -> List[int]:
    """"start:end:stride" DSL (/root/reference/data/dataloader.py:262-300)."""
    if isinstance(spec, int):
        return [spec]
    if isinstance(spec, (list, tuple)):
        return [int(s) for s in spec]
    parts = str(spec).split(":")
    if len(parts) == 1:
        return [int(parts[0])]
    start = int(parts[0]) if parts[0] else 0
    end = int(parts[1])
    stride = int(parts[2]) if len(parts) > 2 and parts[2] else 1
    return list(range(start, end, stride))


def slice_into_cubes(points: np.ndarray, colors: np.ndarray, cube_size: int = 128):
    """Partition a frame into occupied cube_size^3 blocks (vectorized,
    /root/reference/data/dataloader.py:206-238 ``slice_into_cubes2``).

    Returns list of dicts with cube-local coordinates and the cube
    offset (for reassembly verification, §4 data round-trip)."""
    p = points.astype(np.int64)
    cube_idx = p // cube_size
    keys = (cube_idx[:, 0] << 42) | (cube_idx[:, 1] << 21) | cube_idx[:, 2]
    order = np.argsort(keys, kind="stable")
    keys_s = keys[order]
    boundaries = np.nonzero(np.concatenate([[True], keys_s[1:] != keys_s[:-1]]))[0]
    ends = np.concatenate([boundaries[1:], [len(keys_s)]])
    cubes = []
    for b, e in zip(boundaries, ends):
        rows = order[b:e]
        offset = cube_idx[rows[0]] * cube_size
        cubes.append(
            {
                "points": (p[rows] - offset).astype(np.float64),
                "colors": colors[rows],
                "offset": offset.astype(np.int64),
            }
        )
    return cubes


def reassemble_cubes(cubes) -> np.ndarray:
    """Inverse of slice_into_cubes for the round-trip verification the
    reference performs (/root/reference/data/prepare_dataset.py:52-58)."""
    return np.concatenate([c["points"].astype(np.int64) + c["offset"] for c in cubes])


class RawLoader:
    """(sequence, frame) -> PLY sample via path templates
    (/root/reference/data/utils/RawLoader.py:20-59).

    Template config: {sequence_name: {"path": ".../{frame:04d}.ply",
    "frame_offset": int}} in raw_loading.yaml."""

    def __init__(self, config_path: str, data_root: str = ""):
        with open(config_path) as f:
            self.templates = yaml.safe_load(f)
        self.data_root = data_root

    def load(self, sequence: str, frame: int) -> Dict[str, np.ndarray]:
        t = self.templates[sequence]
        frame = frame + t.get("frame_offset", 0)
        path = os.path.join(self.data_root, t["path"].format(frame=frame))
        sample = read_ply(path)
        sample["points"] = np.asarray(sample["points"], np.float64)
        if "colors" not in sample:
            sample["colors"] = np.full((sample["points"].shape[0], 3), 0.5, np.float32)
        return sample


class StaticDataset:
    """Whole-split in-memory dataset with an npz cache, self-materializing
    from raw PLYs on first use (/root/reference/data/dataloader.py:16-163).

    split='train' -> per-cube samples (cube_size blocks, min_points
    filter); other splits -> whole frames.
    """

    def __init__(
        self,
        data_path: str,
        split: str = "train",
        transform: Optional[Compose] = None,
        partition: bool = True,
        min_points: int = 0,
        cube_size: int = 128,
    ):
        self.split = split
        self.transform = transform
        self.partition = partition and split == "train"
        self.min_points = min_points
        self.cube_size = cube_size
        self.samples: List[Dict] = []

        cache = os.path.join(data_path, f"{split}.npz")
        if os.path.exists(cache):
            self._load_cache(cache)
        else:
            self._materialize(data_path, split, cache)
        if min_points:
            self.samples = [s for s in self.samples if s["points"].shape[0] >= min_points]

    def _load_cache(self, cache: str):
        blob = np.load(cache, allow_pickle=True)
        self.samples = list(blob["samples"])

    def _materialize(self, data_path: str, split: str, cache: str):
        cfg_path = os.path.join(data_path, "config.yaml")
        if not os.path.exists(cfg_path):
            raise FileNotFoundError(
                f"no cache {cache} and no dataset config {cfg_path}"
            )
        with open(cfg_path) as f:
            cfg = yaml.safe_load(f)
        raw_cfg = cfg.get("raw_loading", os.path.join(data_path, "raw_loading.yaml"))
        loader = RawLoader(raw_cfg, cfg.get("data_root", ""))
        entries = cfg[split]
        for entry in entries:
            seq = entry["sequence"]
            for frame in parse_frame_range(entry.get("frames", 0)):
                sample = loader.load(seq, frame)
                sample["sequence"] = seq
                sample["frame"] = frame
                if self.partition:
                    for cube in slice_into_cubes(
                        sample["points"].astype(np.int64), sample["colors"], self.cube_size
                    ):
                        cube["sequence"] = seq
                        cube["frame"] = frame
                        self.samples.append(cube)
                else:
                    self.samples.append(sample)
        os.makedirs(data_path, exist_ok=True)
        np.savez_compressed(cache, samples=np.array(self.samples, dtype=object))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        s = dict(self.samples[idx])
        if self.transform is not None:
            rng = np.random.default_rng()
            s = self.transform(s, rng)
        return s


class SyntheticCubeDataset:
    """Hermetic stand-in for StaticDataset: procedurally generated
    surface cubes with the voxel statistics of 128^3 training cubes."""

    def __init__(self, num_samples: int = 64, cube_size: int = 128,
                 points_per_cube: int = 3000, seed: int = 0,
                 transform: Optional[Compose] = None):
        self.cube_size = cube_size
        self.transform = transform
        self.samples = []
        for i in range(num_samples):
            coords, colors = surface_cloud(
                points_per_cube, resolution=cube_size, seed=seed + i
            )
            self.samples.append(
                {"points": coords.astype(np.float64), "colors": colors,
                 "sequence": "synthetic", "frame": i}
            )

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        s = dict(self.samples[idx])
        if self.transform is not None:
            s = self.transform(s, np.random.default_rng(idx))
        return s


class SyntheticBodyDataset:
    """Training cubes sliced from full synthetic vox10 bodies — the
    hermetic mirror of the reference's pipeline (UVG-VPC frames ->
    128^3 cubes -> min_points filter,
    /root/reference/data/dataloader.py:79-163,206-259). Bodies carry
    texture-like colors (data/synthetic.textured_colors)."""

    def __init__(self, num_frames: int = 10, points_per_frame: int = 600_000,
                 cube_size: int = 128, min_points: int = 300, seed: int = 0,
                 transform=None):
        from .synthetic import body_cloud

        self.cube_size = cube_size
        self.transform = transform
        self.samples = []
        for f in range(num_frames):
            coords, colors = body_cloud(points_per_frame, resolution=1024,
                                        seed=seed + 1000 * f)
            for cube in slice_into_cubes(coords, colors, cube_size):
                if cube["points"].shape[0] < min_points:
                    continue
                self.samples.append(
                    {"points": cube["points"], "colors": cube["colors"],
                     "sequence": f"synthetic_{f}", "frame": f}
                )

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        s = dict(self.samples[idx])
        if self.transform is not None:
            s = self.transform(s, np.random.default_rng(idx))
        return s


def collate_padded(samples, capacity: int):
    """Pad a list of samples into [B, capacity, ...] arrays — the
    TPU-native ``sparse_collate``/custom_collate_fn
    (/root/reference/data/utils/util.py:4-25)."""
    B = len(samples)
    coords = np.zeros((B, capacity, 3), np.int32)
    feats = np.zeros((B, capacity, 3), np.float32)
    valid = np.zeros((B, capacity), bool)
    for b, s in enumerate(samples):
        n = min(s["points"].shape[0], capacity)
        coords[b, :n] = s["points"][:n].astype(np.int32)
        feats[b, :n] = s["colors"][:n]
        valid[b, :n] = True
    return coords, feats, valid


class Loader:
    """Shuffled epoch iterator yielding padded batches (replaces
    torch DataLoader + workers, /root/reference/train.py:94-100; the
    padding collate is cheap enough to run inline)."""

    def __init__(self, dataset, batch_size: int, capacity: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.capacity = capacity
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(len(self)):
            batch = [self.dataset[j] for j in idx[i * self.batch_size:(i + 1) * self.batch_size]]
            yield collate_padded(batch, self.capacity)
