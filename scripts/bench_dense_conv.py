"""Decompose dense_conv cost: halo gathers vs einsums vs chunking."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def t(fn, *a, n=3):
    import jax

    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main(n_tiles=229376, cin=128, cout=128):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu.ops import tiles as TL

    rng = np.random.default_rng(0)
    B = 1
    feats_np = (rng.standard_normal((B, n_tiles, 64 * cin)) * 0.3).astype(np.float32)
    feats = jnp.asarray(feats_np, dtype=jnp.bfloat16)
    del feats_np
    nbr = jnp.asarray(rng.integers(0, n_tiles, (B, 26, n_tiles)).astype(np.int32))
    W = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.05)
    bias = jnp.zeros(cout)
    mask = jnp.asarray(rng.random((B, n_tiles, 64)) < 0.4)

    print(f"tiles={n_tiles} cin={cin} cout={cout} "
          f"flops={n_tiles*64*27*cin*cout*2/1e12:.1f} TF", flush=True)

    full = jax.jit(lambda f: TL.dense_conv(f, nbr, W, bias, mask=mask))
    print(f"dense_conv full: {t(full, feats)*1000:.0f} ms", flush=True)

    # einsum-only: one big matmul with the same total FLOPs
    x2 = feats.reshape(B * n_tiles * 64, cin)  # view, same buffer
    W2 = jnp.asarray(rng.standard_normal((cin, 27 * cout)).astype(np.float32)).astype(jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    print(f"equiv matmul ({x2.shape[0]}x{cin}x{27*cout}): {t(mm, x2, W2)*1000:.0f} ms", flush=True)

    # gather-only: 26 whole-tile row gathers
    @jax.jit
    def gathers(f):
        acc = jnp.zeros((), jnp.float32)
        for d in range(26):
            g = jax.vmap(lambda a, r: jnp.take(a, r, axis=0))(f, nbr[:, d])
            acc = acc + jnp.sum(g.astype(jnp.float32))
        return acc

    print(f"26 whole-tile gathers: {t(gathers, feats)*1000:.0f} ms", flush=True)

    # chunk-size sweep
    for chunk in (1024, 4096, 8192):
        TL_old = TL.CONV_TILE_CHUNK
        TL.CONV_TILE_CHUNK = chunk
        try:
            fn = jax.jit(lambda f: TL.dense_conv(f, nbr, W, bias, mask=mask))
            print(f"dense_conv chunk={chunk}: {t(fn, feats)*1000:.0f} ms", flush=True)
        finally:
            TL.CONV_TILE_CHUNK = TL_old


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
