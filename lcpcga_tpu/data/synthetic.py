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


def textured_colors(coords: np.ndarray, resolution: int, rng) -> np.ndarray:
    """Texture-like colors: smooth base + multi-octave harmonics +
    random soft patches. Real scans (8iVFB bodies) carry clothing
    texture and skin gradients; pure smooth harmonics make color coding
    trivially easy, which would overstate RD performance."""
    x = coords.astype(np.float32) / resolution
    base = 0.5 + 0.25 * np.stack(
        [
            np.sin(2 * np.pi * (x[:, 0] + 0.3 * x[:, 1])),
            np.cos(2 * np.pi * (x[:, 1] + 0.5 * x[:, 2])),
            np.sin(2 * np.pi * (x[:, 2] + 0.7 * x[:, 0])),
        ],
        axis=1,
    )
    # Multi-octave directional harmonics (value-noise-like detail).
    detail = np.zeros_like(base)
    for octave in range(4):
        freq = 4.0 * (2.0**octave)
        amp = 0.25 / (1.6**octave)
        for c in range(3):
            d = rng.standard_normal(3)
            d /= np.linalg.norm(d)
            phase = rng.uniform(0, 2 * np.pi)
            detail[:, c] += amp * np.sin(freq * 2 * np.pi * (x @ d) + phase)
    # Soft color patches (clothing-panel-like regions).
    patches = np.zeros_like(base)
    for _ in range(6):
        center = rng.random(3)
        r = rng.uniform(0.08, 0.25)
        tint = rng.uniform(-0.35, 0.35, 3)
        w = np.exp(-((x - center) ** 2).sum(axis=1) / (2 * r * r))
        patches += w[:, None] * tint[None, :]
    return np.clip(base + detail + patches, 0.0, 1.0).astype(np.float32)


def body_cloud(
    n_points: int,
    resolution: int = 1024,
    seed: int = 0,
):
    """A textured synthetic vox10 'body': deformed-sphere geometry with
    texture-like colors (see textured_colors). Stand-in for an
    8iVFB/UVG-VPC frame in hermetic environments."""
    rng = np.random.default_rng(seed)
    coords, _ = surface_cloud(n_points, resolution=resolution, seed=seed,
                              n_blobs=8)
    return coords, textured_colors(coords, resolution, rng)


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
