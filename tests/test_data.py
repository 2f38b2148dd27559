"""Data pipeline tests: PLY round trip, cube slicing round trip
(the reference's own data QA, /root/reference/data/prepare_dataset.py:52-58),
transforms, loader collation."""

import numpy as np
import pytest

from lcpcga_tpu.data.dataset import (
    Loader,
    SyntheticCubeDataset,
    collate_padded,
    parse_frame_range,
    reassemble_cubes,
    slice_into_cubes,
)
from lcpcga_tpu.data.ply import read_ply, write_ply
from lcpcga_tpu.data.transform import (
    ColorJitter,
    RandomRotate,
    build_transforms,
    rgb_to_yuv,
    yuv_to_rgb,
)
from lcpcga_tpu.data.synthetic import surface_cloud


def test_ply_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 1024, (500, 3)).astype(np.float64)
    cols = rng.random((500, 3)).astype(np.float32)
    path = str(tmp_path / "a.ply")
    write_ply(path, pts, cols)
    back = read_ply(path)
    np.testing.assert_allclose(back["points"], pts, rtol=1e-6)
    # colors go through uint8
    np.testing.assert_allclose(back["colors"], np.round(cols * 255) / 255, atol=1e-6)


def test_ply_ascii_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.integers(0, 1024, (100, 3)).astype(np.float64)
    cols = (rng.random((100, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "a.ply")
    write_ply(path, pts, cols, ascii=True)
    back = read_ply(path)
    np.testing.assert_allclose(back["points"], pts, atol=1e-4)
    np.testing.assert_array_equal((back["colors"] * 255).round().astype(np.uint8), cols)


def test_cube_slicing_roundtrip():
    coords, colors = surface_cloud(20000, resolution=512, seed=2)
    cubes = slice_into_cubes(coords, colors, 128)
    assert all(c["points"].max() < 128 and c["points"].min() >= 0 for c in cubes)
    total = sum(c["points"].shape[0] for c in cubes)
    assert total == coords.shape[0]
    # Round-trip distance check (reference asserts < 1e-10)
    back = reassemble_cubes(cubes)
    back_sorted = back[np.lexsort(back.T[::-1])]
    orig_sorted = coords[np.lexsort(coords.astype(np.int64).T[::-1])]
    np.testing.assert_array_equal(back_sorted, orig_sorted)


def test_parse_frame_range():
    assert parse_frame_range("0:10:2") == [0, 2, 4, 6, 8]
    assert parse_frame_range("5:8") == [5, 6, 7]
    assert parse_frame_range(3) == [3]
    assert parse_frame_range([1, 4]) == [1, 4]


def test_color_jitter_bounds():
    rng = np.random.default_rng(3)
    sample = {"points": np.zeros((100, 3)), "colors": rng.random((100, 3)).astype(np.float32)}
    t = ColorJitter({})
    out = t(sample, rng)
    assert out["colors"].shape == (100, 3)
    assert out["colors"].min() >= 0 and out["colors"].max() <= 1
    assert not np.allclose(out["colors"], sample["colors"])


def test_random_rotate_grid_and_bounds():
    coords, colors = surface_cloud(3000, resolution=128, seed=4)
    t = RandomRotate({"block_size": 128})
    out = t({"points": coords.astype(np.float64), "colors": colors},
            np.random.default_rng(5))
    p = out["points"]
    assert np.all(p == np.round(p))
    assert p.min() >= 0 and p.max() < 128
    assert np.unique(p, axis=0).shape[0] == p.shape[0]


def test_yuv_inverse():
    rng = np.random.default_rng(6)
    rgb = rng.random((50, 3)).astype(np.float32)
    np.testing.assert_allclose(yuv_to_rgb(rgb_to_yuv(rgb)), rgb, atol=1e-5)


def test_build_transforms_from_yaml_schema():
    cfg = {
        "1_ColorJitter": {"key": "ColorJitter"},
        "2_Rotate": {"key": "RandomRotate", "block_size": 128},
    }
    compose = build_transforms(cfg)
    assert len(compose.transforms) == 2


def test_loader_shapes():
    ds = SyntheticCubeDataset(num_samples=10, points_per_cube=500)
    loader = Loader(ds, batch_size=4, capacity=768, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    coords, feats, valid = batches[0]
    assert coords.shape == (4, 768, 3) and feats.shape == (4, 768, 3)
    assert valid.sum(axis=1).min() > 0


def test_voxelize_devoxelize_roundtrip():
    """Voxelize -> Devoxelize recovers the (deduplicated) integer point
    set and its colors (/root/reference/data/transform.py:190-272)."""
    from lcpcga_tpu.data.transform import Devoxelize, Voxelize

    rng = np.random.default_rng(3)
    pts = np.unique(rng.integers(0, 32, (300, 3)), axis=0).astype(np.float64)
    colors = rng.random((pts.shape[0], 3)).astype(np.float32)
    sample = {"points": pts, "colors": colors}
    vox = Voxelize({"block_size": 32})(dict(sample))
    assert vox["voxels"].shape == (4, 32, 32, 32)
    assert "points" not in vox
    back = Devoxelize({"block_size": 32})(vox)
    order = np.lexsort(back["points"].T)
    ref_order = np.lexsort(pts.T)
    np.testing.assert_array_equal(back["points"][order], pts[ref_order])
    np.testing.assert_allclose(back["colors"][order], colors[ref_order],
                               atol=1e-6)


def test_project_texture_skip_and_apply():
    """probability is the chance of SKIPPING (reference quirk,
    /root/reference/data/transform.py:357-358); applied projection
    recolors exactly the in-footprint points."""
    from lcpcga_tpu.data.transform import ProjectTexture

    pts = np.array([[1.0, 2.0, 3.0], [5.0, 5.0, 0.0], [200.0, 1.0, 0.0]])
    colors = np.full((3, 3), 0.25, np.float32)
    t = ProjectTexture({"block_size": 16, "probability": 1.0})
    # Pass a copy so the assertion compares against a pristine original
    # (same-object compare could not detect in-place mutation).
    out = t({"points": pts, "colors": colors.copy()}, np.random.default_rng(0))
    np.testing.assert_array_equal(out["colors"], colors)  # always skipped

    t = ProjectTexture({"block_size": 16, "probability": 0.0})
    out = t({"points": pts, "colors": colors.copy()},
            np.random.default_rng(0))
    assert not np.allclose(out["colors"][:2], 0.25)  # in-footprint recolored
    np.testing.assert_array_equal(out["colors"][2], colors[2])  # x=200 out
