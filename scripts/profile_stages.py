"""Per-stage timing of the codec pipeline at vox10 scale."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(name, fn, *args, n=2):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    log(f"{name}: {(time.time()-t0)/n:.3f}s")
    return out


def main(n_points=780_000):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu.codec_runtime import PointCloudCodec, _channel_indexes
    from lcpcga_tpu.coding import octree_encode, rans_encode
    from lcpcga_tpu.data import surface_cloud
    from lcpcga_tpu.models import Capacities, ColorModel
    from lcpcga_tpu import ops
    from lcpcga_tpu.ops import coords as C

    import dataclasses

    coords, colors = surface_cloud(n_points, resolution=1024, seed=0)
    n = coords.shape[0]
    caps = dataclasses.replace(
        Capacities.for_cloud(coords, margin=1.2), same_tile_fraction=1.05
    )
    model = ColorModel(caps=caps)

    cap1 = caps.cap(1)
    pc = np.zeros((1, cap1, 3), np.int32)
    pf = np.zeros((1, cap1, 3), np.float32)
    pv = np.zeros((1, cap1), bool)
    pc[0, :n], pf[0, :n], pv[0, :n] = coords, colors, True
    x = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm_q = x.with_feats(jnp.where(x.valid[..., None], 0.3, 0.0) * jnp.ones((1, cap1, 2)))

    init = jax.jit(lambda r, x, q, lam: model.init(r, x, q, lam, training=True))
    params = init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                  x, qm_q, qm_q)
    codec = PointCloudCodec(model, params)
    codec.update()
    log("setup done")

    # encode stages
    y, q_lat, k, _ov = timed("analysis", codec._analysis, codec.params, x, qm_q)
    z_vals, z_count, _zov = timed("encode_z", codec._encode_z, codec.params, y)

    n_z = int(z_count[0])
    z_np = np.asarray(z_vals[0, :n_z]).astype(np.int32)
    ch = z_np.shape[1]
    t0 = time.time()
    z_payload = rans_encode(z_np.ravel(), _channel_indexes(n_z, ch), codec.tables_z)
    log(f"rans z ({z_np.size} sym): {time.time()-t0:.3f}s")

    z_hat = (z_np.astype(np.float32) + codec.z_medians[None, :]).astype(np.float32)
    z_pad = np.zeros((1, caps.cap(32), ch), np.float32)
    z_pad[0, :n_z] = z_hat
    y_coords = codec._coords_st(y.keys, y.count, 8)
    scales, means, indexes, q_hat = timed(
        "decode_params", codec._decode_params, codec.params, y_coords, jnp.asarray(z_pad)
    )

    n_y = int(y.count[0])
    y_feats = np.asarray(y.feats[0, :n_y], np.float32)
    means_np = np.asarray(means[0, :n_y], np.float32)
    idx_np = np.asarray(indexes[0, :n_y], np.int32)
    v_y = np.round(y_feats - means_np).astype(np.int32)
    t0 = time.time()
    y_payload = rans_encode(v_y.ravel(), idx_np.ravel(), codec.tables_y)
    log(f"rans y ({v_y.size} sym): {time.time()-t0:.3f}s")

    y_xyz = np.asarray(C.unpack(y.keys[0, :n_y]))
    t0 = time.time()
    pts_payload = octree_encode(y_xyz // 8, 7)
    log(f"octree ({n_y} pts): {time.time()-t0:.3f}s")

    # decode synthesis
    y_hat_feats = v_y.astype(np.float32) + means_np
    y_hat_pad = np.zeros((1, cap1 and caps.cap(8), y_hat_feats.shape[1]), np.float32)
    y_hat_pad[0, :n_y] = y_hat_feats
    y_hat = y_coords.with_feats(jnp.asarray(y_hat_pad))
    k_arr = jnp.asarray(np.asarray(k[:1]), jnp.int32)
    timed("synthesis", codec._synthesis, codec.params, y_hat, q_hat, k_arr)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 780_000)
