"""Stage-level decomposition of the TRAINING forward at cube scale.

Times each piece as its own jitted program with the axon-correct
protocol (varied forced inputs, async dispatch, one block): qmap,
analysis g_a, entropy (training), synthesis stages a-d (+gt pyramid),
and each loss term. Localizes the ~3.4 s fwd+loss at batch 4 x 4096.

Run while the chip is otherwise idle: python scripts/profile_train_stages.py [batch] [cap]
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
    log(f"{name:24s}: {dt*1000:8.1f} ms/call (compile {t_compile:.1f}s)")
    del outs
    return out


def main(batch=4, capacity=4096):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu.data.dataset import SyntheticCubeDataset, Loader
    from lcpcga_tpu.data.qmap import QMap
    from lcpcga_tpu.models import Capacities, make_model
    from lcpcga_tpu.training.loss import Loss
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
            _ = np.asarray(a[0, :2])
        sets.append(arrs)
    log(f"inputs forced (batch {batch} x {cap})")

    x0 = ops.from_coords(*sets[0], space_bits=7)
    rng = jax.random.PRNGKey(0)
    q0, lam0 = qmap(x0, rng)
    init = jax.jit(lambda r, x, q, lam: model.init(r, x, q, lam, training=True))
    params = init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                  x0, q0, lam0)
    jax.block_until_ready(params)

    rngs = [jax.random.PRNGKey(100 + i) for i in range(4)]

    # Stage 0: from_coords + qmap.
    @jax.jit
    def s_qmap(coords, feats, valid, rng):
        x = ops.from_coords(coords, feats, valid, space_bits=7)
        q, lam = qmap(x, rng)
        return x, q, lam

    xql = [s_qmap(*s, r) for s, r in zip(sets, rngs)]
    jax.block_until_ready(xql)
    bench("from_coords+qmap", s_qmap,
          [s + (r,) for s, r in zip(sets, rngs)])

    # Stage 1: analysis.
    @jax.jit
    def s_ga(params, x, q):
        return model.apply(params, x, q, method=type(model).analysis)

    ga_out = [s_ga(params, x, q) for (x, q, _l) in xql]
    jax.block_until_ready(ga_out)
    bench("analysis g_a", s_ga, [(params, x, q) for (x, q, _l) in xql])

    # Stage 2: entropy model (training mode).
    @jax.jit
    def s_em(params, y, rng):
        return model.apply(
            params, y, True, rngs={"noise": rng},
            method=lambda m, y, tr: m.entropy_model(y, tr))

    em_out = [s_em(params, y, r) for (y, _q, _k, _o), r in zip(ga_out, rngs)]
    jax.block_until_ready(em_out)
    bench("entropy (train)", s_em,
          [(params, y, r) for (y, _q, _k, _o), r in zip(ga_out, rngs)])

    # Stage 3: synthesis with gt pyramid.
    @jax.jit
    def s_gs(params, y_hat, q_hat, k, x):
        return model.apply(params, y_hat, q_hat, k, x,
                           method=lambda m, yh, qh, k, gt: m.g_s(yh, qh, k, gt=gt))

    gs_in = []
    for (x, _q, _l), (y, _ql, k, _o), (y_hat, q_hat, _lik) in zip(
            xql, ga_out, em_out):
        gs_in.append((params, y_hat, q_hat, k, x))
    gs_out = [s_gs(*a) for a in gs_in]
    jax.block_until_ready(gs_out)
    bench("synthesis g_s (+gt)", s_gs, gs_in)

    # Stage 4: loss terms on frozen forward outputs.
    def make_pred(gs, em, lam):
        x_hat, points, predictions, _ov = gs
        y_hat, q_hat, (lik_y, lik_z) = em
        return {
            "prediction": x_hat, "points": points,
            "occ_predictions": predictions, "q_map": lam,
            "likelihoods": {"y": lik_y, "z": lik_z},
        }

    preds = [make_pred(gs, em, l) for gs, em, (_x, _q, l) in
             zip(gs_out, em_out, xql)]

    for name in list(loss.losses):
        term = loss.losses[name]

        @jax.jit
        def s_loss(x, pred, _term=term):
            return _term(x, pred)

        ins = [(x, p) for (x, _q, _l), p in zip(xql, preds)]
        out0 = [s_loss(*a) for a in ins]
        jax.block_until_ready(out0)
        bench(f"loss[{name}]", s_loss, ins)


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
