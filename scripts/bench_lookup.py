"""Micro-benchmark key-lookup strategies on TPU (table 180k, queries 4M)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def timeit(fn, *args, n=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main(n_table=180_000, n_query=4_000_000):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = np.unique(rng.integers(0, 1 << 30, n_table * 2).astype(np.int32))[:n_table]
    table = np.sort(table)
    queries = rng.choice(table, n_query).astype(np.int32)
    miss = rng.integers(0, 1 << 30, n_query // 4).astype(np.int32)
    queries[: len(miss)] = miss
    t = jnp.asarray(table)
    q = jnp.asarray(queries)

    @jax.jit
    def scan_search(t, q):
        pos = jnp.searchsorted(t, q)
        safe = jnp.minimum(pos, t.shape[0] - 1)
        return jnp.where(t[safe] == q, pos, t.shape[0])

    @jax.jit
    def sort_search(t, q):
        pos = jnp.searchsorted(t, q, method="sort")
        safe = jnp.minimum(pos, t.shape[0] - 1)
        return jnp.where(t[safe] == q, pos, t.shape[0])

    @jax.jit
    def join_search(t, q):
        n, m = t.shape[0], q.shape[0]
        keys = jnp.concatenate([t, q])
        ids = jnp.concatenate([jnp.arange(n, dtype=jnp.int32),
                               jnp.full((m,), -1, jnp.int32)])
        order = jnp.argsort(keys, stable=True)
        sorted_ids = ids[order]
        fill = jax.lax.associative_scan(jnp.maximum, sorted_ids)
        res = jnp.zeros(n + m, jnp.int32).at[order].set(fill)
        idx = res[n:]
        safe = jnp.clip(idx, 0, n - 1)
        return jnp.where((idx >= 0) & (t[safe] == q), safe, n)

    a = np.asarray(scan_search(t, q))
    c = np.asarray(join_search(t, q))
    print("join matches scan:", np.array_equal(a, np.where(a < n_table, a, n_table)) and np.array_equal(np.asarray(c), a))

    for name, fn in [("scan", scan_search), ("sort", sort_search), ("join", join_search)]:
        try:
            dt = timeit(fn, t, q)
            print(f"{name}: {dt*1000:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
