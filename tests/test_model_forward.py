"""End-to-end model tests: forward shapes, loss finiteness, training step.

SURVEY.md §7 minimum slice: forward reconstructs a cube and the loss
decreases under optimization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lcpcga_tpu import ops
from lcpcga_tpu.data import QMap, batch_from_clouds, surface_cloud
from lcpcga_tpu.models import Capacities, ColorModel
from lcpcga_tpu.training import Loss

LOSS_CFG = {
    "focal": {"type": "Multiscale_FocalLoss", "alpha": 0.5, "gamma": 2.0},
    "color": {"type": "ColorLoss", "loss": "L2"},
    "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0},
    "bpp-z": {"type": "BPPLoss", "key": "z", "weight": 1.0},
}

QMAP_CFG = {
    "lambda_A_min": 0,
    "lambda_A_max": 6400,
    "lambda_G_min": 0,
    "lambda_G_max": 200,
    "mode": "quadratic",
}


def tiny_batch(batch=2, n=160, seed=0, capacity=256):
    clouds = [surface_cloud(n, resolution=64, seed=seed + b) for b in range(batch)]
    coords, feats, valid = batch_from_clouds(clouds, capacity)
    return ops.from_coords(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid))


@pytest.fixture(scope="module")
def setup():
    caps = Capacities(caps=(256, 256, 256, 256, 256, 256), cand_factor=27, tile_fraction=0.0)
    model = ColorModel(caps=caps, g_a_n1=16, g_a_n2=24, g_a_n3=24,
                       g_s_n1=24, g_s_n2=24, g_s_n3=16,
                       c_bottleneck=24, c_hyper=16)
    x = tiny_batch()
    qm = QMap(QMAP_CFG)
    key = jax.random.PRNGKey(0)
    q, lam = qm(x, key)
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, q, lam, training=True,
    )
    return model, params, x, q, lam


def test_forward_training_shapes(setup):
    model, params, x, q, lam = setup
    out = model.apply(params, x, q, lam, training=True, rngs={"noise": jax.random.PRNGKey(3)})
    # reconstruction has exactly the input point count per item (top-k with true k)
    np.testing.assert_array_equal(np.asarray(out["prediction"].count), np.asarray(x.count))
    assert out["prediction"].num_channels == 3
    assert out["prediction"].stride == 1
    # k = counts at strides [4, 2, 1]
    k = np.asarray(out["k"])
    assert k.shape == (x.batch_size, 3)
    assert np.all(k[:, 2] == np.asarray(x.count))
    assert np.all(k[:, 0] <= k[:, 1]) and np.all(k[:, 1] <= k[:, 2])
    # likelihoods in (0, 1]
    for key in ("y", "z"):
        lik = np.asarray(out["likelihoods"][key])
        assert np.all(lik > 0) and np.all(lik <= 1.0 + 1e-6)
    # occupancy pyramid: 3 scales with matching GT levels
    assert len(out["occ_predictions"]) == 3 and len(out["points"]) == 3
    assert [p.stride for p in out["points"]] == [4, 2, 1]


def test_forward_eval_mode(setup):
    model, params, x, q, lam = setup
    out = model.apply(params, x, q, lam, training=False)
    assert np.all(np.isfinite(np.asarray(out["prediction"].feats)))


def test_loss_finite_and_training_step_decreases(setup):
    model, params, x, q, lam = setup
    loss_fn = Loss(LOSS_CFG)

    def objective(p, noise_key):
        out = model.apply(p, x, q, lam, training=True, rngs={"noise": noise_key})
        total, parts = loss_fn(x, out)
        return total, parts

    (l0, parts) = objective(params, jax.random.PRNGKey(5))
    assert np.isfinite(float(l0))
    for name, v in parts.items():
        assert np.isfinite(float(v)), name

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(lambda p, k: objective(p, k)[0]))

    @jax.jit
    def step(p, s, k):
        l, g = grad_fn(p, k)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    losses = []
    p = params
    for i in range(8):
        p, opt_state, l = step(p, opt_state, jax.random.PRNGKey(10 + i))
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_aux_loss(setup):
    model, params, x, q, lam = setup
    aux = model.apply(params, method=lambda m: m.aux_loss())
    assert np.isfinite(float(aux)) and float(aux) > 0
