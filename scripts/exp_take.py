"""Raw gather (`take`) throughput on the axon TPU at tile-conv shapes.

Separates the take itself from the post-gather slab reshuffle to find
where the 117 ms of faces+gather24 (Nt=40960, C=64) actually goes.
Protocol: device-generated forced inputs, K async dispatches, one block
(see .claude/skills/verify/SKILL.md).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench(name, fn, input_sets, iters=6, nbytes=0):
    t0 = time.time()
    jax.block_until_ready(fn(*input_sets[0]))
    t_compile = time.time() - t0
    for s in input_sets[1:]:
        fn(*s)
    t0 = time.time()
    prev = None
    for i in range(iters):
        prev = fn(*input_sets[i % len(input_sets)])
    jax.block_until_ready(prev)
    # blocking only on the last output still serializes the queue (one
    # stream); per-call = total / iters.
    dt = (time.time() - t0) / iters
    extra = f"  ({nbytes/dt/1e9:.0f} GB/s out)" if nbytes else ""
    log(f"{name}: compile {t_compile:.1f}s, run {dt*1000:.2f}ms{extra}")
    return dt


def main():
    B, Nt, cin, size = 1, 40960, 64, 4
    zw = size + 2
    log(f"backend={jax.default_backend()} Nt={Nt}")

    def mk_idx(seed, n_rows, table_rows):
        k = jax.random.PRNGKey(seed)
        idx = jax.random.randint(k, (B, n_rows), 0, table_rows, jnp.int32)
        _ = np.asarray(idx[0, :4])
        return idx

    def mk_table(seed, rows, width):
        tbl = jax.random.normal(jax.random.PRNGKey(seed), (B, rows, width),
                                jnp.bfloat16)
        _ = np.asarray(tbl[0, 0, :4])
        return tbl

    take = jax.jit(
        lambda t, i: jax.vmap(lambda a, r: jnp.take(a, r, axis=0))(t, i))

    # t1: 24*Nt rows of 2KB (the current face-slab take)
    tbl1 = mk_table(1, 4 * (Nt + 1), size * size * cin)
    sets1 = [(tbl1, mk_idx(10 + s, 24 * Nt, 4 * (Nt + 1))) for s in range(3)]
    n1 = 24 * Nt * size * size * cin * 2
    bench("take 24Nt x 2KB", take, sets1, nbytes=n1)

    # t2: 8*Nt rows of 12KB (whole z-ext tiles)
    tbl2 = mk_table(2, Nt + 1, size * size * zw * cin)
    sets2 = [(tbl2, mk_idx(20 + s, 8 * Nt, Nt + 1)) for s in range(3)]
    n2 = 8 * Nt * size * size * zw * cin * 2
    bench("take 8Nt x 12KB", take, sets2, iters=4, nbytes=n2)

    # t3: 26*Nt rows of 8KB (whole plain tiles, the XLA-path equivalent)
    tbl3 = mk_table(3, Nt + 1, size**3 * cin)
    sets3 = [(tbl3, mk_idx(30 + s, 26 * Nt, Nt + 1)) for s in range(2)]
    n3 = 26 * Nt * size**3 * cin * 2
    bench("take 26Nt x 8KB", take, sets3, iters=2, nbytes=n3)

    # t4: 8*Nt rows of 2KB (fewer rows, face-sized)
    sets4 = [(tbl1, mk_idx(40 + s, 8 * Nt, 4 * (Nt + 1))) for s in range(3)]
    n4 = 8 * Nt * size * size * cin * 2
    bench("take 8Nt x 2KB", take, sets4, nbytes=n4)

    # t5: 24*Nt rows of 2KB from an 8x SMALLER table (cache residency?)
    tbl5 = mk_table(5, (Nt + 1) // 8, size * size * cin)
    sets5 = [(tbl5, mk_idx(50 + s, 24 * Nt, (Nt + 1) // 8)) for s in range(3)]
    bench("take 24Nt x 2KB (small table)", take, sets5, nbytes=n1)

    # t6: sorted (near-monotone) indices — does locality help take?
    def mk_sorted(seed, n_rows, table_rows):
        k = jax.random.PRNGKey(seed)
        idx = jax.random.randint(k, (B, n_rows), 0, table_rows, jnp.int32)
        idx = jnp.sort(idx, axis=1)
        _ = np.asarray(idx[0, :4])
        return idx

    sets6 = [(tbl1, mk_sorted(60 + s, 24 * Nt, 4 * (Nt + 1)))
             for s in range(3)]
    bench("take 24Nt x 2KB (sorted idx)", take, sets6, nbytes=n1)

    # t7: roll-based z-neighbor (the sorted-adjacency alternative)
    def mk_keys(seed):
        k = jax.random.PRNGKey(seed)
        keys = jnp.cumsum(
            jax.random.randint(k, (B, Nt), 1, 3, jnp.int32), axis=1)
        _ = np.asarray(keys[0, :4])
        return keys

    tblz = mk_table(7, Nt, size**3 * cin)

    def roll_z(tbl, keys):
        zhi = jnp.roll(tbl, -1, axis=1)
        adj = (jnp.roll(keys, -1, axis=1) - keys) == 1
        return zhi * adj[..., None].astype(tbl.dtype)

    sets7 = [(tblz, mk_keys(70 + s)) for s in range(3)]
    bench("roll z-neighbor (full tiles)", jax.jit(roll_z), sets7,
          nbytes=Nt * size**3 * cin * 2)


if __name__ == "__main__":
    main()
