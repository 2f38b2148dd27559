"""Stage-by-stage full-scale codec run with progress prints (TPU debug)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(n_points=780_000):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu.codec_runtime import PointCloudCodec
    from lcpcga_tpu.data import QMap, surface_cloud
    from lcpcga_tpu.models import Capacities, ColorModel
    from lcpcga_tpu import ops

    log(f"generating cloud n={n_points}")
    coords, colors = surface_cloud(n_points, resolution=1024, seed=0)
    n = coords.shape[0]
    caps = Capacities.for_points(int(n * 1.05))
    log(f"caps: {[caps.cap(1<<i) for i in range(6)]} cand: {[caps.cand(s) for s in (8,4,2)]}")
    model = ColorModel(caps=caps)

    cap1 = caps.cap(1)
    pc = np.zeros((1, cap1, 3), np.int32)
    pf = np.zeros((1, cap1, 3), np.float32)
    pv = np.zeros((1, cap1), bool)
    pc[0, :n], pf[0, :n], pv[0, :n] = coords, colors, True
    x = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm = QMap({"lambda_A_min": 0, "lambda_A_max": 6400,
               "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"})
    q, lam = qm(x, jax.random.PRNGKey(0))
    log("init (jitted)...")
    init = jax.jit(lambda rngs, x, q, lam: model.init(rngs, x, q, lam, training=True))
    params = init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                  x, q, lam)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    log("init done")

    codec = PointCloudCodec(model, params)
    codec.update()
    log("tables built")

    for it in range(3):
        t0 = time.perf_counter()
        stream, dbg = codec.compress(coords, colors, (0.2, 0.4))
        log(f"iter{it} compress done {time.perf_counter()-t0:.2f}s "
            f"n_y={dbg['n_y']} n_z={dbg['n_z']} bytes={len(stream.to_bytes())}")
        t0 = time.perf_counter()
        rc, rcol = codec.decompress(stream)
        log(f"iter{it} decompress done {time.perf_counter()-t0:.2f}s n_out={rc.shape[0]}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 780_000
    main(n)
