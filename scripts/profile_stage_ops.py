"""Component-level timing of the decode hot path at vox10 scale.

Decomposes stage_c/stage_d into their irregular primitives (rasterize,
neighbor_rows, halo'd dense convs, extract_sparse, build_upsample_grid,
top-k) as SEPARATE jitted programs on the TPU — the synthesis stages
measure conv-FLOP-light but wall-heavy, so the question is where the
row-scaling ops (sorts / searchsorted lookups / gathers / scatters)
spend their time, and how that shifts between tile sizes T=2 / T=4.

Run: python scripts/profile_stage_ops.py [n_points]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(name, fn, *args, n=2):
    import jax

    fn = jax.jit(fn)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    first = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    log(f"{name}: {(time.time()-t0)/n:.3f}s (compile+run {first:.1f}s)")
    return out


def main(n_points=780_000):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu import ops
    from lcpcga_tpu.data import surface_cloud
    from lcpcga_tpu.models import Capacities
    from lcpcga_tpu.ops import tiles as TL
    from lcpcga_tpu.ops import coords as C

    coords, colors = surface_cloud(n_points, resolution=1024, seed=0)
    caps = Capacities.for_cloud(coords, margin=1.2)
    n = coords.shape[0]
    log(f"cloud {n}, caps {caps.caps}")

    # A stride-2 sparse tensor standing in for the stage_c input
    # (post up4 pruning: k2 rows at stride 2).
    c2 = np.unique((coords // 2) * 2, axis=0).astype(np.int32)
    n2 = c2.shape[0]
    cap2 = caps.cap(2)
    pc = np.zeros((1, cap2, 3), np.int32)
    pv = np.zeros((1, cap2), bool)
    pc[0, :n2], pv[0, :n2] = c2, True
    pf = np.random.default_rng(0).standard_normal((1, cap2, 128)).astype(np.float32)
    pf[0, ~pv[0]] = 0
    x2 = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf * pv[..., None]),
                         jnp.asarray(pv))
    x2 = ops.SparseTensor(keys=x2.keys, feats=x2.feats, count=x2.count, stride=2)
    log(f"stride-2 rows: {n2}")

    rng = np.random.default_rng(1)

    for T in (4, 2):
        tile_cap = max(256, ops.round_up(int(1.05 * caps.cap(T * 2))))
        log(f"--- same-stride stack primitives at T={T} (cap {tile_cap}) ---")
        grid, feats = timed(f"T{T} rasterize(128ch)",
                            lambda s: TL.rasterize(s, tile_cap, tile=T), x2)
        nbr = timed(f"T{T} neighbor_rows",
                    lambda k: TL.neighbor_rows(k), grid.keys)
        mask = grid.mask & grid.valid[:, :, None]
        W = jnp.asarray(rng.standard_normal((27, 128, 128)).astype(np.float32) * 0.05)
        b = jnp.zeros((128,), jnp.float32)
        fb = feats.astype(jnp.bfloat16)
        out = timed(f"T{T} dense_conv 128->128",
                    lambda f, nb, m: TL.dense_conv(f, nb, W, b, mask=m),
                    fb, nbr, mask)
        timed(f"T{T} extract_sparse",
              lambda g, f, m: TL.extract_sparse(g, f, m, cap2), grid, out, mask)
        timed(f"T{T} scatter_feats",
              lambda g, s: TL.scatter_feats(g, s, dtype=jnp.bfloat16), grid, x2)

    log("--- upsample (2->1) primitives (T=4 candidates) ---")
    ucap = caps.tile_cap(2)
    grid, emb = timed("build_upsample_grid",
                      lambda s: TL.build_upsample_grid(s, ucap), x2)
    nbr = timed("up neighbor_rows", lambda k: TL.neighbor_rows(k), grid.keys)
    cell_mask = grid.mask & grid.valid[:, :, None]
    Wt = jnp.asarray(rng.standard_normal((27, 128, 64)).astype(np.float32) * 0.05)
    bt = jnp.zeros((64,), jnp.float32)
    x = timed("transpose_dense_conv 128->64",
              lambda e, nb, m: TL.transpose_dense_conv(
                  e.astype(jnp.bfloat16), nb, Wt, bt, mask=m),
              emb, nbr, cell_mask)
    W6 = jnp.asarray(rng.standard_normal((27, 64, 64)).astype(np.float32) * 0.05)
    b6 = jnp.zeros((64,), jnp.float32)
    x = timed("dense_conv 64->64 (cand)",
              lambda f, nb, m: TL.dense_conv(f, nb, W6, b6, mask=m, relu=True),
              x, nbr, cell_mask)
    W1 = jnp.asarray(rng.standard_normal((27, 64, 1)).astype(np.float32) * 0.05)
    b1 = jnp.zeros((1,), jnp.float32)
    occ = timed("dense_conv 64->1 (occ)",
                lambda f, nb, m: TL.dense_conv(f, nb, W1, b1, mask=m),
                x, nbr, cell_mask)
    from lcpcga_tpu.ops.sparse import topk_mask_flat

    B, Nt = grid.keys.shape
    k = jnp.asarray([n], jnp.int32)
    keep = timed("topk_mask_flat",
                 lambda o, m: topk_mask_flat(
                     o.reshape(1, -1).astype(jnp.float32),
                     m.reshape(1, -1), k).reshape(m.shape),
                 occ, cell_mask)
    timed("extract_sparse (out)",
          lambda g, f, kp: TL.extract_sparse(g, f, kp, caps.cap(1)),
          grid, x, keep)

    log("--- raw primitive scaling ---")
    for m in (1, 4, 8, 16):
        keys = jnp.asarray(
            np.sort(rng.integers(0, 1 << 30, size=(1, m * 1_000_000),
                                 dtype=np.int32)), jnp.int32)
        timed(f"sort {m}M int32", lambda a: jnp.sort(a), keys)
    srt = jnp.sort(jnp.asarray(
        rng.integers(0, 1 << 30, size=(1, 600_000), dtype=np.int32)))
    qry = jnp.asarray(rng.integers(0, 1 << 30, size=(1, 26 * 600_000),
                                   dtype=np.int32))
    timed("searchsorted 15.6M over 600k",
          lambda s, q: jax.vmap(
              lambda a, b: jnp.searchsorted(a, b))(s, q), srt, qry)
    timed("argsort 900k", lambda a: jnp.argsort(a), srt[:, :600_000])


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 780_000)
