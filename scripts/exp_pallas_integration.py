"""Integration-mechanism experiments for the fused Pallas tile convs.

Round-2 findings (STATUS.md): the Pallas kernel measures ~35-40 TF/s
marginal vs ~5 TF/s for the XLA tile conv, but integration stalled on
  (a) axon AOT helper crashing on lax.map-wrapped pallas_call,
  (b) python-unrolled chunks exploding compile time,
  (c) 27 ms/launch for separate executables unless async-chained.

This script re-measures all three mechanisms at representative vox10
shapes so round 3 can pick the integration path with data.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def make_inputs(B, Nt, size, cin, n_chunks, seed=0):
    rng = np.random.default_rng(seed)
    chunk = Nt // n_chunks
    feats = jnp.asarray(
        rng.standard_normal((B, Nt, size**3 * cin), np.float32), jnp.bfloat16
    )
    nbr = jnp.asarray(rng.integers(0, Nt + 1, (B, 26, Nt)), jnp.int32)
    kern = jnp.asarray(rng.standard_normal((27, cin, cin), np.float32) * 0.05)
    bias = jnp.zeros((cin,), jnp.float32)
    mask = jnp.asarray(rng.random((B, Nt, size**3)) < 0.5)
    return feats, nbr, kern, bias, mask


def bench(name, fn, *args, iters=3):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / iters
    log(f"{name}: compile {t_compile:.1f}s, run {dt*1000:.1f}ms")
    return out, dt


def main():
    from lcpcga_tpu.ops import pallas_conv as PC
    from lcpcga_tpu.ops import tiles as TL

    B, size, cin = 1, 4, 64
    Nt = 40960  # ~stride-1 post-conv tile count at vox10
    log(f"backend={jax.default_backend()} Nt={Nt} cin={cin}")

    feats, nbr, kern, bias, mask = make_inputs(B, Nt, size, cin, 10)

    # -- 0. XLA baseline (current production path) --
    xla_fn = jax.jit(
        lambda f, n, k, b, m: TL.dense_conv(f, n, k, b, mask=m, relu=True)
    )
    bench("xla dense_conv", xla_fn, feats, nbr, kern, bias, mask)

    # -- 1. python-unrolled pallas chunks inside ONE jit --
    import os

    os.environ["LCPCGA_PALLAS"] = "1"
    pallas_fn = jax.jit(
        lambda f, n, k, b, m: PC.tile_conv(
            f, n, k, b, m.astype(jnp.bfloat16), size=size, relu=True
        )
    )
    try:
        bench("pallas unrolled-chunks jit", pallas_fn, feats, nbr, kern, bias, mask)
    except Exception as e:
        log(f"pallas unrolled FAILED: {type(e).__name__}: {str(e)[:300]}")

    # -- 2. lax.map around the per-chunk body (the round-2 crasher) --
    chunk = 4096

    def chunked_map(f, n, k, b, m):
        n_chunks = Nt // chunk
        slab_cat = jnp.concatenate(
            [TL._extract_slabs(f, size, cin)[key] for key in PC._FACE_ORDER],
            axis=1,
        )
        w = k.astype(jnp.bfloat16)
        b_arr = b.astype(jnp.float32).reshape(1, -1)

        def body(ci):
            start = ci * chunk
            core = jax.lax.dynamic_slice(f, (0, start, 0), (B, chunk, size**3 * cin))
            core6 = core.reshape(B, chunk, size, size, size, cin)
            nb = jax.lax.dynamic_slice(n, (0, 0, start), (B, 26, chunk))
            nb = jnp.where(nb < Nt, nb, Nt)
            g = PC._gather_faces(slab_cat, nb, Nt + 1)
            g6 = g.reshape(B, 26, chunk, size, size, cin)
            tb = PC.BLOCK_TILES
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            kernel_fn = functools.partial(
                PC._dense_kernel, tb=tb, cin=cin, cout=cin, relu=True, size=size
            )
            call = pl.pallas_call(
                kernel_fn,
                grid=(B, chunk // tb),
                in_specs=[
                    pl.BlockSpec((1, tb, size, size, size, cin),
                                 lambda bb, i: (bb, i, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 26, tb, size, size, cin),
                                 lambda bb, i: (bb, 0, i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((27, cin, cin), lambda bb, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, cin), lambda bb, i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tb, size**3, cin),
                                       lambda bb, i: (bb, i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, chunk, size**3, cin),
                                               jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM(
                    (tb, size + 2, size + 2, size + 2, cin), jnp.bfloat16)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )
            raw = call(core6, g6, w, b_arr)
            mm = jax.lax.dynamic_slice(m, (0, start, 0), (B, chunk, size**3))
            return (raw * mm.astype(raw.dtype)[..., None]).reshape(
                B, chunk, size**3 * cin
            )

        chunks = jax.lax.map(body, jnp.arange(n_chunks))
        return jnp.moveaxis(chunks, 0, 1).reshape(B, Nt, -1)

    map_fn = jax.jit(chunked_map)
    try:
        out_map, _ = bench("pallas lax.map-chunks jit", map_fn, feats, nbr,
                           kern, bias, mask)
    except Exception as e:
        log(f"pallas lax.map FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
