"""Micro-profile the MultiscaleFocalLoss internals on TPU.

Realistic cube-scale shapes: lam [4,4096] keys at stride 1..4, occ
candidate sets [4, 9216/18432/36864]. Varied forced inputs, async
dispatch, one block.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench(name, fn, input_sets, iters=8):
    import jax

    out = fn(*input_sets[0])
    jax.block_until_ready(out)
    outs = []
    t0 = time.time()
    for i in range(iters):
        outs.append(fn(*input_sets[(i + 1) % len(input_sets)]))
    jax.block_until_ready(outs)
    log(f"{name:34s}: {(time.time()-t0)/iters*1000:8.1f} ms/call")
    del outs


def main():
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu import ops
    from lcpcga_tpu.ops import coords as C
    from lcpcga_tpu.ops import kernel_map, avg_pool, contains, downsample_map
    from lcpcga_tpu.data import surface_cloud, batch_from_clouds

    B = 4
    # lam map at stride 1: 4096-capacity cube cloud.
    sets = []
    for s in range(3):
        clouds = [surface_cloud(2800, resolution=128, seed=10 * s + b)
                  for b in range(B)]
        pc, pf, pv = batch_from_clouds(clouds, 4096)
        lam = ops.from_coords(jnp.asarray(pc),
                              jnp.asarray(np.random.rand(B, 4096, 2).astype(np.float32)),
                              jnp.asarray(pv), space_bits=7)
        # Candidate occupancy keys at stride 1: children of stride-2 set.
        occ_clouds = [surface_cloud(9000, resolution=128, seed=99 + 10 * s + b)
                      for b in range(B)]
        oc, of, ov = batch_from_clouds(occ_clouds, 36864)
        occ = ops.from_coords(jnp.asarray(oc),
                              jnp.asarray(np.random.rand(B, 36864, 1).astype(np.float32)),
                              jnp.asarray(ov), space_bits=7)
        jax.block_until_ready((lam.keys, occ.keys))
        _ = np.asarray(lam.keys[0, :2]); _ = np.asarray(occ.keys[0, :2])
        sets.append((lam, occ))
    log("inputs forced")

    offs = C.conv_offsets(3, 1)

    bench("contains(gt, occ.keys)", jax.jit(lambda lam, occ: contains(lam, occ.keys)), sets)
    bench("kernel_map 27 taps", jax.jit(lambda lam, occ: kernel_map(lam, occ.keys, offs)), sets)

    @jax.jit
    def km_pool(lam, occ):
        nbr = kernel_map(lam, occ.keys, offs)
        return avg_pool(lam, occ, nbr).feats

    bench("kernel_map + avg_pool", km_pool, sets)

    @jax.jit
    def down(lam, occ):
        lam_out, lam_nbr = downsample_map(lam, lam.capacity)
        return avg_pool(lam, lam_out, lam_nbr).feats

    bench("downsample_map + avg_pool", down, sets)

    @jax.jit
    def focal_math(lam, occ):
        overlap = contains(lam, occ.keys)
        p = jax.nn.sigmoid(occ.feats[..., 0])
        pt = jnp.where(overlap, p, 1.0 - p)
        alpha = jnp.where(overlap, 0.5, 0.5)
        pt = jnp.clip(pt, 1e-2, 1.0)
        return (-alpha * (1.0 - pt) ** 2.0 * jnp.log(pt)).sum()

    bench("focal math + contains", focal_math, sets)


if __name__ == "__main__":
    main()
