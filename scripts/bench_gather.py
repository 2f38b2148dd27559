"""Measure random row-gather throughput on the TPU as a function of row
size — decides the halo-exchange design (whole-tile vs slab gathers).

Run: python scripts/bench_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def t(fn, *a, n=5):
    import jax

    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    n_rows = 229376
    n_gather = 26 * n_rows  # the halo workload's row count

    for row_bytes in (256, 1024, 4096, 16384):
        row_elems = row_bytes // 2  # bf16
        src = jax.random.normal(key, (n_rows, row_elems), jnp.bfloat16)
        idx = jax.random.randint(key, (n_gather,), 0, n_rows, jnp.int32)
        jax.block_until_ready((src, idx))

        f = jax.jit(lambda s, i: jnp.sum(jnp.take(s, i, axis=0).astype(jnp.float32)))
        dt = t(f, src, idx)
        gb = n_gather * row_bytes / 1e9
        print(f"row {row_bytes:6d} B: {dt*1e3:7.1f} ms  {gb/dt:6.1f} GB/s "
              f"{n_gather/dt/1e6:6.1f} Mrows/s", flush=True)

    # contiguous read baseline
    src = jax.random.normal(key, (n_gather // 8, 8192), jnp.bfloat16)
    f2 = jax.jit(lambda s: jnp.sum(s.astype(jnp.float32)))
    dt = t(f2, src)
    gb = src.size * 2 / 1e9
    print(f"contiguous sum: {dt*1e3:7.1f} ms  {gb/dt:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
