"""Training-step decomposition with the axon-correct protocol.

Varied inputs per call (defeats memoization), inputs forced before
timing, K calls dispatched then ONE block. Decomposes: full step vs
forward+loss vs value_and_grad, and tiled vs streamed synthesis paths.

Run while training is STOPPED (single chip).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench(name, fn, input_sets, iters=6):
    import jax

    t0 = time.time()
    out = fn(*input_sets[0])
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    outs = []
    t0 = time.time()
    for i in range(iters):
        outs.append(fn(*input_sets[(i + 1) % len(input_sets)]))
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    log(f"{name}: {dt:.3f}s/call (compile+first {t_compile:.1f}s)")
    del outs, out
    return dt


def main(batch=4, capacity=4096, tile_fraction=0.7):
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
        tile_fraction=tile_fraction,
        analysis_tiles=False,
    )
    dataset = SyntheticCubeDataset(num_samples=8 * batch)
    loader = Loader(dataset, batch, capacity=cap, seed=0)
    model = make_model(config["model"], caps)
    qmap = QMap(config.get("q_map", {}))
    loss = Loss(config.get("loss", {}))

    sets = []
    it = iter(loader)
    for _ in range(4):
        coords, feats, valid = next(it)
        arrs = (jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid))
        for a in arrs:
            _ = np.asarray(a[0, :2])  # force
        sets.append(arrs)
    log(f"inputs forced (batch {batch} x {cap}, tile_fraction {tile_fraction})")

    x = ops.from_coords(*sets[0], space_bits=7)
    rng = jax.random.PRNGKey(0)
    q, lam = qmap(x, rng)
    init = jax.jit(lambda r, x, q, lam: model.init(r, x, q, lam, training=True))
    params = init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                  x, q, lam)
    jax.block_until_ready(params)

    rngs = [jax.random.PRNGKey(100 + i) for i in range(4)]

    @jax.jit
    def fwd(params, coords, feats, valid, rng):
        x = ops.from_coords(coords, feats, valid, space_bits=7)
        q_key, noise_key = jax.random.split(rng)
        q, lam = qmap(x, q_key)
        out = model.apply(params, x, q, lam, training=True,
                          rngs={"noise": noise_key})
        total, parts = loss(x, out)
        return total

    bench("fwd+loss", fwd, [(params,) + s + (r,) for s, r in zip(sets, rngs)])

    @jax.jit
    def vgrad(params, coords, feats, valid, rng):
        def objective(p):
            x = ops.from_coords(coords, feats, valid, space_bits=7)
            q_key, noise_key = jax.random.split(rng)
            q, lam = qmap(x, q_key)
            out = model.apply(p, x, q, lam, training=True,
                              rngs={"noise": noise_key})
            total, _ = loss(x, out)
            return total

        return jax.value_and_grad(objective)(params)

    bench("value_and_grad", vgrad,
          [(params,) + s + (r,) for s, r in zip(sets, rngs)])

    state, opt, aux_opt = create_train_state(model, params)
    step_fn = make_train_step(model, loss, qmap, opt, aux_opt, donate=False, space_bits=7)
    bench("full step", step_fn,
          [(state,) + s + (r,) for s, r in zip(sets, rngs)])


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(v) if i < 2 else float(v) for i, v in enumerate(a)))
