"""Synthetic voxelized point clouds for tests and benchmarks.

The reference's datasets (8iVFB/MVUB/UVG-VPC) are large downloads; in
hermetic environments we exercise the codec on procedurally generated
surface-like clouds with smooth colors — the same voxel statistics
(2D manifold in a 2^R grid) that drive capacity planning and perf.
"""

from __future__ import annotations

import numpy as np


def surface_cloud(
    n_points: int,
    resolution: int = 1024,
    seed: int = 0,
    n_blobs: int = 6,
):
    """Sample a smooth deformed-sphere surface voxelized to ``resolution``.

    Returns (coords [N,3] int32 unique voxels, colors [N,3] float in [0,1]).
    N <= n_points (deduplication).
    """
    rng = np.random.default_rng(seed)
    # Oversample; dedup shrinks the set.
    m = int(n_points * 1.6) + 1024
    theta = np.arccos(1 - 2 * rng.random(m))
    phi = 2 * np.pi * rng.random(m)
    dirs = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)], axis=1
    )
    # Smooth radial perturbation from a few random harmonics.
    radius = np.ones(m)
    for _ in range(n_blobs):
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        freq = rng.uniform(1.0, 4.0)
        amp = rng.uniform(0.05, 0.22)
        radius += amp * np.sin(freq * (dirs @ axis) * np.pi)
    pts = dirs * radius[:, None]
    pts -= pts.min(axis=0)
    pts /= pts.max() + 1e-9
    coords = np.clip((pts * (resolution - 1)).astype(np.int32), 0, resolution - 1)
    coords, idx = np.unique(coords, axis=0, return_index=True)
    if coords.shape[0] > n_points:
        sel = np.sort(rng.choice(coords.shape[0], n_points, replace=False))
        coords = coords[sel]
    # Smooth colors from coordinate harmonics.
    x = coords.astype(np.float32) / resolution
    colors = 0.5 + 0.5 * np.stack(
        [
            np.sin(2 * np.pi * (x[:, 0] + 0.3 * x[:, 1])),
            np.cos(2 * np.pi * (x[:, 1] + 0.5 * x[:, 2])),
            np.sin(2 * np.pi * (x[:, 2] + 0.7 * x[:, 0])),
        ],
        axis=1,
    )
    return coords.astype(np.int32), colors.astype(np.float32)


def batch_from_clouds(clouds, capacity: int):
    """Pack [(coords, colors), ...] into padded arrays for ops.from_coords."""
    B = len(clouds)
    coords = np.zeros((B, capacity, 3), np.int32)
    feats = np.zeros((B, capacity, 3), np.float32)
    valid = np.zeros((B, capacity), bool)
    for b, (p, f) in enumerate(clouds):
        n = min(p.shape[0], capacity)
        coords[b, :n] = p[:n]
        feats[b, :n] = f[:n]
        valid[b, :n] = True
    return coords, feats, valid
