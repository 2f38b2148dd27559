"""Per-stage timing of the DECODE path (synthesis a/b/c/d) at vox10 scale."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(name, fn, *args, n=1):
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


def main(n_points=780_000, stack_tile=4):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lcpcga_tpu import ops
    from lcpcga_tpu.codec_runtime import PointCloudCodec
    from lcpcga_tpu.data import surface_cloud
    from lcpcga_tpu.models import Capacities, ColorModel

    coords, colors = surface_cloud(n_points, resolution=1024, seed=0)
    n = coords.shape[0]
    caps = dataclasses.replace(
        Capacities.for_cloud(coords, margin=1.2), same_tile_fraction=1.05,
        stack_tile=stack_tile,
    )
    log(f"stack_tile={stack_tile}")
    model = ColorModel(caps=caps)
    cap1 = caps.cap(1)
    pc = np.zeros((1, cap1, 3), np.int32)
    pf = np.zeros((1, cap1, 3), np.float32)
    pv = np.zeros((1, cap1), bool)
    pc[0, :n], pf[0, :n], pv[0, :n] = coords, colors, True
    x = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm_q = x.with_feats(
        jnp.where(x.valid[..., None], 0.3, 0.0) * jnp.ones((1, cap1, 2))
    )
    init = jax.jit(lambda r, x, q, lam: model.init(r, x, q, lam, training=True))
    params = init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, qm_q, qm_q,
    )
    codec = PointCloudCodec(model, params, strict_overflow=False)
    codec.update()
    log("setup done")

    y, q_lat, k, _ov = timed("analysis", codec._analysis, codec.params, x, qm_q)
    z_vals, z_count, _zov = codec._encode_z(codec.params, y)
    n_z = int(z_count[0])
    z_np = np.asarray(z_vals[0, :n_z]).astype(np.int32)
    ch = z_np.shape[1]
    z_hat = (z_np.astype(np.float32) + codec.z_medians[None, :]).astype(np.float32)
    z_pad = np.zeros((1, caps.cap(32), ch), np.float32)
    z_pad[0, :n_z] = z_hat
    y_coords = codec._coords_st(y.keys, y.count, 8)
    scales, means, indexes, q_hat = timed(
        "decode_params", codec._decode_params, codec.params, y_coords,
        jnp.asarray(z_pad),
    )
    n_y = int(y.count[0])
    y_feats = np.asarray(y.feats[0, :n_y], np.float32)
    means_np = np.asarray(means[0, :n_y], np.float32)
    v_y = np.round(y_feats - means_np).astype(np.int32)
    y_hat_feats = v_y.astype(np.float32) + means_np
    y_hat_pad = np.zeros((1, caps.cap(8), y_hat_feats.shape[1]), np.float32)
    y_hat_pad[0, :n_y] = y_hat_feats
    y_hat = y_coords.with_feats(jnp.asarray(y_hat_pad))
    k_arr = jnp.asarray(np.asarray(k[:1]), jnp.int32)

    xa, qfa, _occ, _ov = timed(
        "synth_a (8->4)", codec._synth_a, codec.params, y_hat, q_hat, k_arr
    )
    del y_hat, q_hat, scales, means, indexes
    xb, qfb, _occ2, _ov2 = timed(
        "synth_b (4->2)", codec._synth_b, codec.params, xa, qfa, k_arr
    )
    del xa, qfa, _occ, _ov
    xc, _occ3, _ov3 = timed(
        "synth_c (2->1)", codec._synth_c, codec.params, xb, qfb, k_arr
    )
    del xb, qfb, _occ2, _ov2
    timed("synth_d (post)", codec._synth_d, codec.params, xc)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 780_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)
