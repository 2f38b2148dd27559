"""End-to-end evaluation harness test: codec sweep -> reference-schema
CSV -> plots (mini version of /root/reference/evaluate.py + plot.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd
import pytest

from lcpcga_tpu import ops
from lcpcga_tpu.codec_runtime import PointCloudCodec
from lcpcga_tpu.data import QMap, batch_from_clouds, surface_cloud
from lcpcga_tpu.eval.evaluate import CSV_COLUMNS, TestsetRunner
from lcpcga_tpu.eval.plots import compute_bd_deltas, load_results, plot_rd_curves
from lcpcga_tpu.models import Capacities, ColorModel


@pytest.fixture(scope="module")
def tiny_codec():
    caps = Capacities(caps=(512, 512, 512, 384, 384, 384), cand_factor=27,
                      tile_fraction=0.0)
    model = ColorModel(caps=caps, g_a_n1=8, g_a_n2=16, g_a_n3=16,
                       g_s_n1=16, g_s_n2=16, g_s_n3=8,
                       c_bottleneck=16, c_hyper=8)
    coords, colors = surface_cloud(300, resolution=256, seed=11)
    pc, pf, pv = batch_from_clouds([(coords, colors)], 512)
    x = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm = QMap({"lambda_A_min": 0, "lambda_A_max": 6400,
               "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"})
    q, lam = qm(x, jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, q, lam, training=True,
    )
    codec = PointCloudCodec(model, params)
    codec.update()
    return codec, coords, colors


def test_testset_runner_csv_schema(tiny_codec, tmp_path):
    codec, coords, colors = tiny_codec
    frames = [{"points": coords, "colors": colors, "sequence": "synth", "frame": 0}]
    runner = TestsetRunner(str(tmp_path / "Ours"), use_pcqm=False)
    df = runner.run_ours(codec, frames, [(0.2, 0.4), (0.8, 0.8)])
    assert len(df) == 2
    for col in CSV_COLUMNS:
        assert col in df.columns, col
    assert (df["bpp"] > 0).all()
    assert np.isfinite(df["sym_y_psnr"]).all()
    assert os.path.exists(tmp_path / "Ours" / "test.csv")

    # plots consume the CSV
    results = load_results(str(tmp_path), ["Ours"])
    assert "Ours" in results
    written = plot_rd_curves(results, str(tmp_path / "plots"),
                             metrics=("sym_y_psnr",), use_bd_points=False)
    assert written and all(os.path.exists(p) for p in written)


def test_testset_runner_truncates_stale_csv(tiny_codec, tmp_path):
    """A leftover test.csv from an earlier run must not be extended —
    the first row of a fresh runner truncates it (ADVICE r2)."""
    codec, coords, colors = tiny_codec
    frames = [{"points": coords, "colors": colors, "sequence": "synth", "frame": 0}]
    out = tmp_path / "Ours"
    out.mkdir()
    (out / "test.csv").write_text("stale,garbage\n1,2\n3,4\n")
    runner = TestsetRunner(str(out), use_pcqm=False)
    runner.run_ours(codec, frames, [(0.2, 0.4)])
    df = pd.read_csv(out / "test.csv", index_col=0)
    assert len(df) == 1
    assert "stale" not in df.columns and "bpp" in df.columns


def test_view_dep_harness(tiny_codec, tmp_path):
    from lcpcga_tpu.eval.view_dep import run_view_dep

    codec, coords, colors = tiny_codec
    frames = [{"points": coords, "colors": colors, "sequence": "synth", "frame": 0}]
    df = run_view_dep(codec, frames, [(0.2, 0.4)], str(tmp_path),
                      resolution=256,
                      view_grads={"synth": (200.0, 50.0, 2)},
                      cut_offs={"synth": (128.0, 2)})
    assert set(df["key"]) == {"uniform", "view", "roi"}
    assert np.isfinite(df["psnr"]).all() and np.isfinite(df["ssim"]).all()
    assert os.path.exists(tmp_path / "view_dep.csv")
