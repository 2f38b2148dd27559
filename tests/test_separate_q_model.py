"""Dual-hyperprior ablation: Q coded by its own entropy model
(the reference's "entropy_model_map" config variant,
/root/reference/model/model.py:22-27,71-78)."""

import numpy as np
import jax
import jax.numpy as jnp

from lcpcga_tpu import ops
from lcpcga_tpu.data import QMap, batch_from_clouds, surface_cloud
from lcpcga_tpu.models import Capacities, ColorModel, make_model
from lcpcga_tpu.training import Loss


def test_separate_q_model_forward_and_loss():
    caps = Capacities(caps=(256,) * 6, cand_factor=27, tile_fraction=0.0)
    cfg = {
        "entropy_model": {"C_bottleneck": 16, "C_hyper_bottleneck": 8},
        "entropy_model_map": {"C_bottleneck": 2, "C_hyper_bottleneck": 4},
        "g_a": {"C_in": 4, "N1": 8, "N2": 16, "N3": 16, "source_condition": True},
        "g_s": {"C_out": 3, "N1": 16, "N2": 16, "N3": 8, "source_condition": True},
    }
    model = make_model(cfg, caps)
    assert model.separate_q_model

    clouds = [surface_cloud(120, resolution=64, seed=b) for b in range(2)]
    c, f, v = batch_from_clouds(clouds, 256)
    x = ops.from_coords(jnp.asarray(c), jnp.asarray(f), jnp.asarray(v))
    qm = QMap({"lambda_A_min": 0, "lambda_A_max": 6400,
               "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"})
    q, lam = qm(x, jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, q, lam, training=True,
    )
    out = model.apply(params, x, q, lam, training=True,
                      rngs={"noise": jax.random.PRNGKey(3)})
    assert isinstance(out["likelihoods"]["y"], list) and len(out["likelihoods"]["y"]) == 2

    loss_fn = Loss({
        "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0},
        "bpp-z": {"type": "BPPLoss", "key": "z", "weight": 1.0},
        "color": {"type": "ColorLoss", "loss": "L2"},
    })
    total, parts = loss_fn(x, out)
    assert np.isfinite(float(total))

    aux = model.apply(params, method=lambda m: m.aux_loss())
    assert np.isfinite(float(aux))
