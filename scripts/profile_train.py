"""Decompose the training-step wall time at cube scale on the TPU.

STATUS round-3 item 2: the fused step measured ~4.7 s at batch 4 x 4096
with chunk remat — far above its FLOP budget. This times the pieces:
forward-only objective, value_and_grad, aux loss, full step; each as
ONE jitted program (never un-jitted on the tunneled backend).

Run: python scripts/profile_train.py [batch] [capacity]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(name, fn, *args, n=3):
    import jax

    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    log(f"{name}: first {time.time()-t0:.3f}s")
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    log(f"{name}: {(time.time()-t0)/n:.3f}s")
    return out


def main(batch=4, capacity=4096):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu.data.dataset import SyntheticCubeDataset, Loader
    from lcpcga_tpu.data.qmap import QMap
    from lcpcga_tpu.models import Capacities, make_model
    from lcpcga_tpu.training.loss import Loss
    from lcpcga_tpu.parallel import create_train_state, make_train_step
    from lcpcga_tpu.utils import load_config
    from lcpcga_tpu import ops

    config = load_config(os.path.join(os.path.dirname(__file__), os.pardir,
                                      "configs", "ours.yaml"))
    cap = capacity
    caps = Capacities(
        caps=(cap, cap, max(256, cap // 2), max(256, cap // 4),
              max(256, cap // 8), max(256, cap // 8)),
        tile_fraction=0.7,
        analysis_tiles=False,
    )
    dataset = SyntheticCubeDataset(num_samples=2 * batch)
    loader = Loader(dataset, batch, capacity=cap, seed=0)
    model = make_model(config["model"], caps)
    qmap = QMap(config.get("q_map", {}))
    loss = Loss(config.get("loss", {}))

    coords, feats, valid = next(iter(loader))
    batch_arrays = (jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid))
    x = ops.from_coords(*batch_arrays)
    rng = jax.random.PRNGKey(0)
    q, lam = qmap(x, rng)
    init = jax.jit(lambda r, x, q, lam: model.init(r, x, q, lam, training=True))
    params = init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                  x, q, lam)
    log(f"setup done (batch {batch} x {cap})")

    # Forward-only objective.
    @jax.jit
    def fwd(params, coords, feats, valid, rng):
        x = ops.from_coords(coords, feats, valid)
        q_key, noise_key = jax.random.split(rng)
        q, lam = qmap(x, q_key)
        out = model.apply(params, x, q, lam, training=True,
                          rngs={"noise": noise_key})
        total, parts = loss(x, out)
        return total

    timed("forward+loss", fwd, params, *batch_arrays, rng)

    @jax.jit
    def fwd_noloss(params, coords, feats, valid, rng):
        x = ops.from_coords(coords, feats, valid)
        q_key, noise_key = jax.random.split(rng)
        q, lam = qmap(x, q_key)
        out = model.apply(params, x, q, lam, training=True,
                          rngs={"noise": noise_key})
        return jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32))
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else 0.0,
            out)

    timed("forward only", fwd_noloss, params, *batch_arrays, rng)

    @jax.jit
    def grad_step(params, coords, feats, valid, rng):
        def objective(p):
            x = ops.from_coords(coords, feats, valid)
            q_key, noise_key = jax.random.split(rng)
            q, lam = qmap(x, q_key)
            out = model.apply(p, x, q, lam, training=True,
                              rngs={"noise": noise_key})
            total, parts = loss(x, out)
            return total

        return jax.value_and_grad(objective)(params)

    timed("value_and_grad", grad_step, params, *batch_arrays, rng)

    state, opt, aux_opt = create_train_state(model, params)
    step_fn = make_train_step(model, loss, qmap, opt, aux_opt, donate=False)
    timed("full step", step_fn, state, *batch_arrays, rng)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
