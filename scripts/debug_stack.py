"""Standalone full-scale test of the tiled same-stride level stack."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main(n_points=780_000):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu import ops
    from lcpcga_tpu.data import surface_cloud
    from lcpcga_tpu.ops import tiles as TL

    coords, _ = surface_cloud(n_points, resolution=1024, seed=0)
    pts = np.unique((coords // 2) * 2, axis=0)  # stride-2 coordinate set
    n = pts.shape[0]
    cap = ops.round_up(int(n * 1.3))
    tile_cap = ops.round_up(int(0.35 * cap))
    log(f"n={n} cap={cap} tiles={tile_cap}")

    rng = np.random.default_rng(0)
    pc = np.zeros((1, cap, 3), np.int32)
    pv = np.zeros((1, cap), bool)
    pc[0, :n] = pts
    pv[0, :n] = True
    feats = jnp.asarray(rng.standard_normal((1, cap, 128)).astype(np.float32))
    x = ops.from_coords(jnp.asarray(pc), feats, jnp.asarray(pv), stride=2)
    x = x.with_feats(feats)
    qf = x.with_feats(jnp.tanh(feats[..., :2]))

    W1 = jnp.asarray(rng.standard_normal((27, 2, 128)).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.standard_normal((27, 128, 128)).astype(np.float32) * 0.1)
    W3 = jnp.asarray(rng.standard_normal((27, 128, 256)).astype(np.float32) * 0.1)
    b1 = jnp.zeros(128); b2 = jnp.zeros(128); b3 = jnp.zeros(256)

    @jax.jit
    def stack(x, qf):
        grid, qg = TL.rasterize(qf, tile_cap)
        nbr = TL.neighbor_rows(grid.keys)
        mask = grid.mask & grid.valid[:, :, None]
        h = TL.dense_conv(qg.astype(jnp.bfloat16), nbr, W1, b1, mask=mask, relu=True)
        h = TL.dense_conv(h, nbr, W2, b2, mask=mask, relu=True)
        bg_grid = TL.dense_conv(h, nbr, W3, b3, mask=mask)
        bg = TL.extract_sparse(grid, bg_grid, mask, cap, feats_dtype=jnp.float32)
        xg = TL.scatter_feats(grid, x, dtype=jnp.bfloat16)
        x1g = TL.dense_conv(xg, nbr, W2, b2, mask=mask, relu=True)
        x1 = TL.extract_sparse(grid, x1g, mask, cap, feats_dtype=jnp.float32)
        beta, gamma = jnp.split(bg.feats, 2, axis=-1)
        filmed = x.with_feats(x1.feats * beta + gamma)
        x2g = TL.dense_conv(TL.scatter_feats(grid, filmed, dtype=jnp.bfloat16),
                            nbr, W2, b2, mask=mask, relu=True)
        x2 = TL.extract_sparse(grid, x2g, mask, cap, feats_dtype=jnp.float32)
        return x2

    t0 = time.time()
    out = stack(x, qf)
    jax.block_until_ready(out.feats)
    log(f"stack ok {time.time()-t0:.1f}s (compile+run) count={int(out.count[0])}")
    t0 = time.time()
    out = stack(x, qf)
    jax.block_until_ready(out.feats)
    log(f"stack steady {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 780_000)
