"""Bisect the synthesis-stage TPU crash: run g_s alone at growing scales."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def run(n_points):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu import ops
    from lcpcga_tpu.data import surface_cloud
    from lcpcga_tpu.models import Capacities, ColorModel
    from lcpcga_tpu.models.codec import ColorModel as _CM

    log(f"=== n={n_points}")
    import os as _os

    coords, colors = surface_cloud(n_points, resolution=1024, seed=0)
    n = coords.shape[0]
    import dataclasses

    if _os.environ.get("LCPCGA_FOR_CLOUD"):
        caps = Capacities.for_cloud(coords, margin=1.2)
    else:
        caps = Capacities.for_points(int(n * 1.05))
    if _os.environ.get("LCPCGA_SAME_TILES"):
        caps = dataclasses.replace(caps, same_tile_fraction=1.3)
    if _os.environ.get("LCPCGA_POST_TILES"):
        caps = dataclasses.replace(caps, post_tile_fraction=1.3)
    log(f"caps {caps.caps} cand {[caps.cand(s) for s in (8,4,2)]}")
    model = ColorModel(caps=caps)

    # latent coords at stride 8 + true counts
    y_xyz = np.unique((coords // 8) * 8, axis=0)
    k = np.array([[np.unique((coords // 4) * 4, axis=0).shape[0],
                   np.unique((coords // 2) * 2, axis=0).shape[0],
                   n]], np.int32)
    cap8 = caps.cap(8)
    pc = np.zeros((1, cap8, 3), np.int32)
    pv = np.zeros((1, cap8), bool)
    pc[0, :y_xyz.shape[0]] = y_xyz
    pv[0, :y_xyz.shape[0]] = True
    y = ops.from_coords(jnp.asarray(pc),
                        jnp.zeros((1, cap8, 128), jnp.float32), jnp.asarray(pv),
                        stride=8)
    rng = np.random.default_rng(0)
    yf = jnp.asarray(rng.standard_normal((1, cap8, 128)).astype(np.float32))
    y = y.with_feats(yf)
    q = y.with_feats(jnp.where(y.valid[..., None], 0.5, 0.0) * jnp.ones((1, cap8, 2)))

    # init params on a TINY instance to avoid full-scale init cost
    tiny_caps = Capacities(caps=(256,) * 6)
    tiny_model = ColorModel(caps=tiny_caps)
    tc, tcol = surface_cloud(100, resolution=64, seed=1)
    tpc = np.zeros((1, 256, 3), np.int32); tpc[0, :tc.shape[0]] = tc
    tpv = np.zeros((1, 256), bool); tpv[0, :tc.shape[0]] = True
    tx = ops.from_coords(jnp.asarray(tpc), jnp.zeros((1, 256, 3), jnp.float32), jnp.asarray(tpv))
    tq = tx.with_feats(jnp.ones((1, 256, 2)))
    init = jax.jit(lambda r, x, q, lam: tiny_model.init(r, x, q, lam, training=True))
    params = init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                  tx, tq, tq)
    log("params ready")

    # Staged execution (mirrors codec_runtime decode).
    @jax.jit
    def st_a(params, y, q, k):
        return model.apply(params, y, q, k, method=_CM.synthesis_stage_a)

    @jax.jit
    def st_b(params, x, qf, k):
        return model.apply(params, x, qf, k, method=_CM.synthesis_stage_b)

    @jax.jit
    def st_c(params, x, qf, k):
        return model.apply(params, x, qf, k, method=_CM.synthesis_stage_c)

    @jax.jit
    def st_d(params, x):
        return model.apply(params, x, method=_CM.synthesis_stage_d)

    def synth(params, y, q, k, timing=False):
        ts = [time.time()]
        x, qf, _, ov_a = st_a(params, y, q, k)
        jax.block_until_ready(x.feats); ts.append(time.time())
        x, qf, _, ov_b = st_b(params, x, qf, k)
        jax.block_until_ready(x.feats); ts.append(time.time())
        x, _, ov_c = st_c(params, x, qf, k)
        jax.block_until_ready(x.feats); ts.append(time.time())
        x, ov_d = st_d(params, x)
        jax.block_until_ready(x.feats); ts.append(time.time())
        if timing:
            names = ["a(8->4)", "b(4->2)", "c(2->1)", "d(post)"]
            log("  " + "  ".join(f"{n}={ts[i+1]-ts[i]:.2f}s" for i, n in enumerate(names)))
        ovs = [bool(v[0]) for v in (ov_a, ov_b, ov_c, ov_d)]
        return x, ovs

    t0 = time.time()
    out, ovs = synth(params, y, q, jnp.asarray(k))
    log(f"synthesis ok: {time.time()-t0:.1f}s (compile+run) n_out={int(out.count[0])} ov={ovs}")
    t0 = time.time()
    out, _ = synth(params, y, q, jnp.asarray(k), timing=True)
    log(f"synthesis steady: {time.time()-t0:.2f}s")


if __name__ == "__main__":
    for n in [int(a) for a in sys.argv[1:]] or [100_000, 200_000, 400_000, 780_000]:
        run(n)
