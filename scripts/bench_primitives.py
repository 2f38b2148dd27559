"""Decompose sparse-conv primitive costs on TPU: binary search vs sort
join vs row gather vs matmul. Sizes model the 2->1 upsample of a 200k
cloud (table 180k rows x 128ch, 4M queries)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def t(fn, *a, n=5):
    import jax

    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main(n_table=180_000, n_query=4_000_000, c=64):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = np.sort(np.unique(rng.integers(0, 1 << 30, n_table * 2).astype(np.int32)))[:n_table]
    queries = rng.choice(table, n_query).astype(np.int32)
    tj = jnp.asarray(table)
    qj = jnp.asarray(queries)
    feats = jnp.asarray(rng.standard_normal((n_table, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_table, n_query).astype(np.int32))
    w = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32))

    r = {}
    r["searchsorted_scan"] = t(jax.jit(lambda t_, q_: jnp.searchsorted(t_, q_)), tj, qj)

    def join(t_, q_):
        n, m = t_.shape[0], q_.shape[0]
        keys = jnp.concatenate([t_, q_])
        ids = jnp.concatenate([jnp.arange(n, dtype=jnp.int32), jnp.full((m,), -1, jnp.int32)])
        order = jnp.argsort(keys, stable=True)
        fill = jax.lax.associative_scan(jnp.maximum, ids[order])
        return jnp.zeros(n + m, jnp.int32).at[order].set(fill)[n:]

    r["sort_join"] = t(jax.jit(join), tj, qj)
    r["sort_only_4m"] = t(jax.jit(lambda q_: jnp.sort(q_)), qj)
    r["row_gather_f32"] = t(jax.jit(lambda f, i: jnp.take(f, i, axis=0)), feats, idx)
    r["row_gather_bf16"] = t(
        jax.jit(lambda f, i: jnp.take(f.astype(jnp.bfloat16), i, axis=0)), feats, idx
    )
    r["elem_gather"] = t(jax.jit(lambda t_, i: jnp.take(t_, i)), tj, idx)
    r["matmul_4m"] = t(
        jax.jit(lambda f, i, w_: jnp.take(f, i, axis=0) @ w_), feats, idx, w
    )
    big = jnp.asarray(rng.standard_normal((n_query, c)).astype(np.bfloat16))
    r["dense_matmul_4mx64"] = t(jax.jit(lambda x, w_: x @ w_.astype(jnp.bfloat16)), big, w)
    for k, v in r.items():
        print(f"{k}: {v*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
