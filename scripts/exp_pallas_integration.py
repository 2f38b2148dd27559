"""Integration-mechanism experiments for the fused Pallas tile convs.

Round-2 findings (STATUS.md): the Pallas kernel measures ~35-40 TF/s
marginal vs ~5 TF/s for the XLA tile conv, but integration stalled on
  (a) axon AOT helper crashing on lax.map-wrapped pallas_call,
  (b) python-unrolled chunks exploding compile time,
  (c) 27 ms/launch for separate executables unless async-chained.

This script re-measures the mechanisms at representative vox10 shapes
after the z-extension-halo rewrite. Inputs are cycled across iterations
(the axon runtime memoizes repeated identical executions).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def make_inputs(B, Nt, size, cin, seed):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(
        rng.standard_normal((B, Nt, size**3 * cin), np.float32), jnp.bfloat16
    )
    nbr = jnp.asarray(rng.integers(0, Nt + 1, (B, 26, Nt)), jnp.int32)
    mask = jnp.asarray(rng.random((B, Nt, size**3)) < 0.5)
    return feats, nbr, mask


def bench(name, fn, input_sets, iters=6):
    t0 = time.time()
    out = jax.block_until_ready(fn(*input_sets[0]))
    t_compile = time.time() - t0
    # One pass over varied inputs to warm, then timed passes.
    for s in input_sets[1:]:
        jax.block_until_ready(fn(*s))
    t0 = time.time()
    for i in range(iters):
        out = jax.block_until_ready(fn(*input_sets[i % len(input_sets)]))
    dt = (time.time() - t0) / iters
    log(f"{name}: compile {t_compile:.1f}s, run {dt*1000:.1f}ms")
    return out, dt


def main():
    from lcpcga_tpu.ops import pallas_conv as PC
    from lcpcga_tpu.ops import tiles as TL

    B, size, cin = 1, 4, 64
    Nt = 40960  # ~stride-1 post-conv tile count at vox10 (small end)
    log(f"backend={jax.default_backend()} Nt={Nt} cin={cin}")

    rng = np.random.default_rng(0)
    kern = jnp.asarray(rng.standard_normal((27, cin, cin), np.float32) * 0.05)
    bias = jnp.zeros((cin,), jnp.float32)
    sets = [make_inputs(B, Nt, size, cin, s) for s in range(3)]

    flops = 2 * B * Nt * size**3 * 27 * cin * cin

    # -- 0. XLA baseline (current production path) --
    xla_fn = jax.jit(
        lambda f, n, m: TL.dense_conv(f, n, kern, bias, mask=m, relu=True)
    )
    ref, dt = bench("xla dense_conv", xla_fn, sets)
    log(f"  -> {flops/dt/1e12:.1f} TF/s")

    # -- 1. pallas, chunks via lax.map (one trace of the body) --
    pallas_fn = jax.jit(
        lambda f, n, m: PC.tile_conv(
            f, n, kern, bias, m.astype(jnp.bfloat16), size=size, relu=True
        )
    )
    try:
        got, dt = bench("pallas lax.map-chunks", pallas_fn, sets)
        log(f"  -> {flops/dt/1e12:.1f} TF/s")
        err = np.max(np.abs(np.asarray(ref, np.float32) -
                            np.asarray(got, np.float32)))
        log(f"  max|d| vs xla = {err:.4f}")
    except Exception as e:
        log(f"pallas lax.map FAILED: {type(e).__name__}: {str(e)[:300]}")

    # -- 2. single-chunk compile cost (Mosaic share) --
    Nt1 = PC.CHUNK_TILES
    sets1 = [make_inputs(B, Nt1, size, cin, 10 + s) for s in range(3)]
    one_fn = jax.jit(
        lambda f, n, m: PC.tile_conv(
            f, n, kern, bias, m.astype(jnp.bfloat16), size=size, relu=True
        )
    )
    try:
        _, dt1 = bench("pallas single-chunk (Nt=4096)", one_fn, sets1)
        f1 = 2 * B * Nt1 * size**3 * 27 * cin * cin
        log(f"  -> {f1/dt1/1e12:.1f} TF/s")
    except Exception as e:
        log(f"pallas single-chunk FAILED: {type(e).__name__}: {str(e)[:300]}")

    # -- 3. transpose variant via lax.map --
    pf = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, Nt, 8 * cin), np.float32),
        jnp.bfloat16)
    maskT = jnp.asarray(np.random.default_rng(4).random((B, Nt, 64)) < 0.5)
    tr_fn = jax.jit(
        lambda f, n, m: PC.tile_conv(
            f, n, kern, bias, m.astype(jnp.bfloat16), size=2, transpose=True
        )
    )
    setsT = [(pf, s[1], maskT) for s in sets]
    try:
        _, dtT = bench("pallas transpose lax.map", tr_fn, setsT)
        fT = 2 * B * Nt * 8 * 27 * cin * cin
        log(f"  -> {fT/dtT/1e12:.1f} TF/s")
    except Exception as e:
        log(f"pallas transpose FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
