"""Tests for image metrics, renderer, plots, SSIM loss, GDN."""

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd
import pytest

from lcpcga_tpu.eval.image_metrics import psnr, ssim
from lcpcga_tpu.eval.plots import pareto_front, compute_times
from lcpcga_tpu.eval.render import render_image_array


def test_psnr_ssim_identity():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3))
    assert psnr(img, img) == float("inf")
    assert abs(ssim(img, img, channel_axis=2) - 1.0) < 1e-9


def test_psnr_known():
    a = np.zeros((32, 32))
    b = np.full((32, 32), 0.1)
    np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-9)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    img = rng.random((64, 64))
    s1 = ssim(img, np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1))
    s2 = ssim(img, np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1))
    assert 0 < s2 < s1 < 1


def test_render_image_array():
    from lcpcga_tpu.data import surface_cloud

    coords, colors = surface_cloud(5000, resolution=256, seed=2)
    img = render_image_array(coords, colors, "front", resolution=256, image_size=128)
    assert img.shape == (128, 128, 3)
    assert img.min() >= 0 and img.max() <= 1
    assert (img < 1.0).any()  # something was drawn


def test_pareto_front():
    df = pd.DataFrame({
        "bpp": [0.1, 0.2, 0.3, 0.4],
        "1-pcqm": [0.90, 0.85, 0.95, 0.96],
    })
    front = pareto_front(df)
    assert list(front["bpp"]) == [0.1, 0.3, 0.4]


def test_compute_times():
    df = pd.DataFrame({"t_compress": [1.0, 2.0], "t_decompress": [3.0, 5.0]})
    out = compute_times({"X": df})
    enc = out[(out.experiment == "X") & (out.phase == "t_compress")].iloc[0]
    assert abs(enc["mean_s"] - 1.5) < 1e-9


def test_ssim_loss_runs():
    from lcpcga_tpu import ops
    from lcpcga_tpu.data import batch_from_clouds, surface_cloud
    from lcpcga_tpu.training.ssim import ColorSSIM

    coords, colors = surface_cloud(150, resolution=64, seed=3)
    c, f, v = batch_from_clouds([(coords, colors)], 192)
    gt = ops.from_coords(jnp.asarray(c), jnp.asarray(f), jnp.asarray(v))
    # prediction: same coords, noisy colors
    pred_st = gt.with_feats(gt.feats + 0.05)
    lam = gt.with_feats(jnp.ones(gt.feats.shape[:2] + (2,)))
    loss = ColorSSIM({"id": "ssim", "window_size": 3, "yuv": False})(
        gt, {"prediction": pred_st, "q_map": lam}
    )
    assert np.isfinite(float(loss))
    assert float(loss) >= 0
    # identical prediction scores lower (better) than noisy one
    loss0 = ColorSSIM({"id": "ssim", "window_size": 3, "yuv": False})(
        gt, {"prediction": gt, "q_map": lam}
    )
    assert float(loss0) < float(loss)


def test_gdn_layer():
    from lcpcga_tpu.models.gdn import GDN

    x = jnp.asarray(np.random.default_rng(4).standard_normal((5, 16)).astype(np.float32))
    gdn = GDN(channels=16)
    params = gdn.init(jax.random.PRNGKey(0), x)
    y = gdn.apply(params, x)
    assert y.shape == x.shape
    # normalization shrinks magnitudes for the default init
    assert float(jnp.abs(y).mean()) < float(jnp.abs(x).mean()) * 5
    inv = GDN(channels=16, inverse=True)
    pi = inv.init(jax.random.PRNGKey(0), x)
    z = inv.apply(pi, y)
    assert z.shape == x.shape
