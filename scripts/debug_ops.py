"""Bisect which synthesis op kills the TPU worker: run each sparse op
standalone at generative-upsampling scale."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main(n_points=200_000):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu import ops
    from lcpcga_tpu.ops import coords as C
    from lcpcga_tpu.data import surface_cloud

    coords, _ = surface_cloud(n_points, resolution=1024, seed=0)
    base = np.unique((coords // 2) * 2, axis=0)
    n_in = base.shape[0]
    cap_in = ops.round_up(int(n_in * 1.3))
    cap_cand = ops.round_up(18 * cap_in)
    log(f"n_in={n_in} cap_in={cap_in} cap_cand={cap_cand}")

    pc = np.zeros((1, cap_in, 3), np.int32)
    pv = np.zeros((1, cap_in), bool)
    pc[0, :n_in] = base
    pv[0, :n_in] = True
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, cap_in, 128)).astype(np.float32))
    st = ops.from_coords(jnp.asarray(pc), feats, jnp.asarray(pv), stride=2)
    jax.block_until_ready(st.keys)
    log("input ready")

    # 1) expansion (sort + dedup + compact)
    t0 = time.time()
    expand = jax.jit(lambda s: ops.expand_coords(s, cap_cand))
    cand = expand(st)
    jax.block_until_ready(cand.keys)
    log(f"expand ok ({time.time()-t0:.1f}s) n_cand={int(cand.count[0])}")
    t0 = time.time()
    cand = expand(st)
    jax.block_until_ready(cand.keys)
    log(f"expand steady {time.time()-t0:.2f}s")

    # 2) streamed transpose conv
    W = jnp.asarray(rng.standard_normal((27, 128, 64)).astype(np.float32) * 0.05)
    offs = -C.conv_offsets(3, 1)

    t0 = time.time()
    tconv = jax.jit(lambda s, c: ops.sparse_conv_streamed(s, c, offs, W, None))
    x = tconv(st, cand)
    jax.block_until_ready(x)
    log(f"streamed transpose ok ({time.time()-t0:.1f}s)")
    t0 = time.time()
    x = tconv(st, cand)
    jax.block_until_ready(x)
    log(f"streamed transpose steady {time.time()-t0:.2f}s")

    # 3) streamed self conv on candidates
    cand_f = ops.SparseTensor(keys=cand.keys, feats=x.astype(jnp.bfloat16),
                              count=cand.count, stride=1)
    W2 = jnp.asarray(rng.standard_normal((27, 64, 64)).astype(np.float32) * 0.05)
    offs2 = C.conv_offsets(3, 1)
    t0 = time.time()
    sconv = jax.jit(lambda s: ops.sparse_conv_streamed(s, s, offs2, W2, None))
    h = sconv(cand_f)
    jax.block_until_ready(h)
    log(f"streamed self conv ok ({time.time()-t0:.1f}s)")
    t0 = time.time()
    h = sconv(cand_f)
    jax.block_until_ready(h)
    log(f"streamed self conv steady {time.time()-t0:.2f}s")

    # 4) topk + prune
    k = jnp.asarray([n_points // 2], jnp.int32)
    t0 = time.time()
    topk = jax.jit(
        lambda c, s, k: ops.prune(c.with_feats(s), ops.topk_mask(c, s[..., 0], k),
                                  cap_in * 4)
    )
    pruned = topk(cand_f, h.astype(jnp.float32), k)
    jax.block_until_ready(pruned.keys)
    log(f"topk+prune ok ({time.time()-t0:.1f}s) n={int(pruned.count[0])}")
    t0 = time.time()
    pruned = topk(cand_f, h.astype(jnp.float32), k)
    jax.block_until_ready(pruned.keys)
    log(f"topk+prune steady {time.time()-t0:.2f}s")

    log("ALL OPS OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
