"""Data-parallel training-step tests on a virtual 8-device CPU mesh
(SURVEY.md §4 item 4: multi-device tests via device-count override)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcpcga_tpu.data import QMap, batch_from_clouds, surface_cloud
from lcpcga_tpu.models import Capacities, ColorModel
from lcpcga_tpu.parallel import (
    create_train_state,
    data_parallel_mesh,
    make_train_step,
    shard_batch,
)
from lcpcga_tpu.training import Loss
from lcpcga_tpu import ops

LOSS_CFG = {
    "focal": {"type": "Multiscale_FocalLoss", "alpha": 0.5, "gamma": 2.0},
    "color": {"type": "ColorLoss", "loss": "L2"},
    "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0},
    "bpp-z": {"type": "BPPLoss", "key": "z", "weight": 1.0},
}
QMAP_CFG = {"lambda_A_min": 0, "lambda_A_max": 6400,
            "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"}


def make_batch(batch, capacity=256, n=150, seed=0):
    clouds = [surface_cloud(n, resolution=64, seed=seed + b) for b in range(batch)]
    return batch_from_clouds(clouds, capacity)


@pytest.fixture(scope="module")
def setup():
    caps = Capacities(caps=(256,) * 6, cand_factor=27, tile_fraction=0.0)
    model = ColorModel(caps=caps, g_a_n1=8, g_a_n2=16, g_a_n3=16,
                       g_s_n1=16, g_s_n2=16, g_s_n3=8,
                       c_bottleneck=16, c_hyper=8)
    coords, feats, valid = make_batch(8)
    x = ops.from_coords(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid))
    qm = QMap(QMAP_CFG)
    q, lam = qm(x, jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, q, lam, training=True,
    )
    return model, params, qm, (coords, feats, valid)


def test_quantile_mask_hits_only_quantiles(setup):
    from lcpcga_tpu.parallel.train_step import quantile_mask

    model, params, _, _ = setup
    mask = quantile_mask(params)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    hit = [p for p, v in leaves if v]
    assert len(hit) == 1  # exactly the EB quantiles
    assert any("quantiles" in str(k) for k in hit[0])


def test_sharded_train_step_runs_and_matches_single_device(setup):
    model, params, qm, (coords, feats, valid) = setup
    assert jax.device_count() == 8
    loss_fn = Loss(LOSS_CFG)
    mesh = data_parallel_mesh()

    state, opt, aux_opt = create_train_state(model, params)
    step_sharded = make_train_step(model, loss_fn, qm, opt, aux_opt, mesh=mesh, donate=False)
    step_single = make_train_step(model, loss_fn, qm, opt, aux_opt, mesh=None, donate=False)

    rng = jax.random.PRNGKey(42)
    batch = shard_batch(mesh, (jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid)))
    s1, m1 = step_sharded(state, *batch, rng)
    s2, m2 = step_single(state, jnp.asarray(coords), jnp.asarray(feats),
                         jnp.asarray(valid), rng)
    # Same math irrespective of the mesh (CPU f32 is deterministic up to
    # reduce-order differences; losses should agree closely).
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["aux_loss"]), float(m2["aux_loss"]), rtol=1e-4)

    # A few sharded steps decrease the loss.
    s, _ = s1, m1
    losses = [float(m1["loss"])]
    for i in range(4):
        s, m = step_sharded(s, *batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(s.step) == 5


def test_distributed_init_single_process():
    """jax.distributed join path (parallel/mesh.py distributed_init):
    exercised as a 1-process job in a fresh interpreter (initialize()
    mutates global backend state, so it must not run in this process).
    Multi-host runs differ only in env values."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from lcpcga_tpu.parallel import distributed_init\n"
        "pid = distributed_init('localhost:18765', num_processes=1, process_id=0)\n"
        "assert pid == 0, pid\n"
        "assert jax.process_count() == 1\n"
        "pid2 = distributed_init('localhost:18765', num_processes=1, process_id=0)\n"
        "assert pid2 == 0  # idempotent re-init\n"
        "print('DIST_OK')\n"
    )
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=180, env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "DIST_OK" in out.stdout, (out.stdout, out.stderr)
