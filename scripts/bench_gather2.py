"""Honest TPU gather-bandwidth micro-bench for the halo workload.

sum(tanh(gathered)) forces the actual HBM reads (a plain sum lets XLA
factor the reduction through the gather and skip the rows entirely).

Run: python scripts/bench_gather2.py [n_tiles] [cin]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def t(fn, *a, n=3):
    import jax

    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main(n_tiles=114688, cin=128):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (n_tiles, 64 * cin), jnp.bfloat16)
    nbr = jax.random.randint(ks[1], (26, n_tiles), 0, n_tiles, jnp.int32)
    jax.block_until_ready((x, nbr))

    CH = 4096
    nch = n_tiles // CH

    def whole_tile(x, nbr):
        def chunk(ci):
            rows = jax.lax.dynamic_slice(nbr, (0, ci * CH), (26, CH))
            g = jnp.take(x, rows.reshape(-1), axis=0)
            return jnp.sum(jnp.tanh(g.astype(jnp.float32)))
        return jnp.sum(jax.lax.map(chunk, jnp.arange(nch)))

    dt = t(jax.jit(whole_tile), x, nbr)
    gb = 26 * n_tiles * 64 * cin * 2 / 1e9
    print(f"whole-tile gather: {dt*1e3:.0f} ms  {gb/dt:.0f} GB/s "
          f"({26*n_tiles/dt/1e6:.1f} Mrows/s)", flush=True)

    # face-slab arrays (16 cells), gather 26x from 6 arrays
    xs = x.reshape(n_tiles, 4, 4, 4, cin)
    faces = []
    for ax, sl in ((1, 0), (1, 3), (2, 0), (2, 3), (3, 0), (3, 3)):
        f = jnp.take(xs, jnp.array([sl]), axis=ax).reshape(n_tiles, 16 * cin)
        faces.append(f)
    faces = jnp.stack(faces)  # [6, Nt, 16*cin]
    jax.block_until_ready(faces)

    def face_gather(faces, nbr):
        def chunk(ci):
            rows = jax.lax.dynamic_slice(nbr, (0, ci * CH), (26, CH))
            tot = jnp.float32(0)
            for di in range(26):
                f = faces[di % 6]
                g = jnp.take(f, rows[di], axis=0)
                tot = tot + jnp.sum(jnp.tanh(g.astype(jnp.float32)))
            return tot
        return jnp.sum(jax.lax.map(chunk, jnp.arange(nch)))

    dt = t(jax.jit(face_gather), faces, nbr)
    gb = 26 * n_tiles * 16 * cin * 2 / 1e9
    print(f"face-slab gather:  {dt*1e3:.0f} ms  {gb/dt:.0f} GB/s "
          f"({26*n_tiles/dt/1e6:.1f} Mrows/s)", flush=True)

    # contiguous tanh-sum baseline
    f2 = jax.jit(lambda s: jnp.sum(jnp.tanh(s.astype(jnp.float32))))
    dt = t(f2, x)
    print(f"contiguous tanh-sum: {dt*1e3:.0f} ms  {x.size*2/1e9/dt:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
