"""Per-stage cost breakdown of the fused Pallas tile-conv path.

Timing protocol for the axon tunnel (measured 2026-08-18):
  - The runtime defers execution while input buffers are only lazily
    scheduled; FORCE inputs (tiny fetch) before timing.
  - Each host<->device sync costs ~29 ms of tunnel latency; dispatch K
    varied calls asynchronously and block ONCE, so the floor amortizes.
  - Identical (executable, buffers) executions can be memoized; vary
    inputs across calls.
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


N_SETS = 4
ITERS = 8


def bench(name, fn, input_sets, iters=ITERS, flops=0):
    t0 = time.time()
    out = fn(*input_sets[0])
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    for s in input_sets[1:]:
        outs = fn(*s)
    t0 = time.time()
    outs = []
    for i in range(iters):
        outs.append(fn(*input_sets[i % len(input_sets)]))
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    extra = f"  ({flops/dt/1e12:.1f} TF/s)" if flops else ""
    log(f"{name}: compile {t_compile:.1f}s, run {dt*1000:.2f}ms{extra}")
    del outs, out
    return dt


def main():
    from lcpcga_tpu.ops import pallas_conv as PC
    from lcpcga_tpu.ops import tiles as TL

    B, size, cin = 1, 4, 64
    Nt = 40960
    tb = PC.BLOCK_TILES
    zw = size + 2
    log(f"backend={jax.default_backend()} Nt={Nt} cin={cin}")

    kern = jax.random.normal(jax.random.PRNGKey(99), (27, cin, cin),
                             jnp.float32) * 0.05
    bias = jnp.zeros((cin,), jnp.float32)

    def mk(seed):
        k = jax.random.split(jax.random.PRNGKey(seed), 3)
        f = jax.random.normal(k[0], (B, Nt, size**3 * cin), jnp.bfloat16)
        n = jax.random.randint(k[1], (B, 26, Nt), 0, Nt + 1, jnp.int32)
        m = (jax.random.uniform(k[2], (B, Nt, size**3)) < 0.5)
        _ = np.asarray(f[0, seed % 16, :4])  # force materialization
        _ = np.asarray(n[0, 0, :4])
        _ = np.asarray(m[0, 0, :4])
        return f, n, m

    sets = [mk(s) for s in range(N_SETS)]
    _ = np.asarray(kern[0, 0, :4])
    log("inputs forced")
    flops = 2 * B * Nt * size**3 * 27 * cin * cin

    # 0. XLA baseline end-to-end
    xla_fn = jax.jit(
        lambda f, n, m: TL.dense_conv(f, n, kern, bias, mask=m, relu=True))
    bench("xla dense_conv e2e", xla_fn, sets, flops=flops)

    # 0b. pallas tile_conv end-to-end (lax.map chunks)
    pl_fn = jax.jit(lambda f, n, m: PC.tile_conv(
        f, n, kern, bias, m.astype(jnp.bfloat16), size=size, relu=True))
    bench("pallas tile_conv e2e", pl_fn, sets, flops=flops)

    # 1. z-extend
    def f_zext(x, n, m):
        n = jnp.where(n < Nt, n, Nt)
        return PC._z_extend(x, n, size, cin)
    bench("z_extend(full)", jax.jit(f_zext), sets)

    # 2. face extract
    def f_faces(x, n, m):
        fc = PC._extract_faces_2d(x, size, cin, (0, 1, 2, 3))
        return fc.reshape(B, 4 * (Nt + 1), size * size * cin)
    bench("faces(full)", jax.jit(f_faces), sets)

    # 3. faces + slab gather 24 x Nt rows (one take)
    def f_gather_all(x, n, m):
        n = jnp.where(n < Nt, n, Nt)
        fc = PC._extract_faces_2d(x, size, cin, (0, 1, 2, 3))
        fc = fc.reshape(B, 4 * (Nt + 1), size * size * cin)
        return PC._gather_slabs_2d(fc, n, PC._DIR2D_ROWS, PC._DIR2D_FACE,
                                   Nt + 1, size, cin)
    bench("faces+gather24(full)", jax.jit(f_gather_all), sets)

    # 4. z-ext + whole-tile 8-dir gather (8 x Nt rows of 12KB)
    def f_gather_tiles(x, n, m):
        n = jnp.where(n < Nt, n, Nt)
        xz = PC._z_extend(x, n, size, cin)
        xzf = xz.reshape(B, Nt, size * size * zw * cin)
        xzf = jnp.concatenate([xzf, jnp.zeros_like(xzf[:, :1])], axis=1)
        mid_rows = n[:, PC._DIR2D_ROWS[:, 1]]
        idx = mid_rows.reshape(B, -1)
        g = jax.vmap(lambda a, r: jnp.take(a, r, axis=0))(xzf, idx)
        return g.reshape(B, 8, Nt, size, size, zw, cin)
    bench("zext+gather8-wholetile(full)", jax.jit(f_gather_tiles), sets)

    # 5. pallas matmul alone on pre-gathered inputs
    def mkg(seed):
        k = jax.random.split(jax.random.PRNGKey(100 + seed), 2)
        core = jax.random.normal(k[0], (B, Nt, size, size, zw, cin),
                                 jnp.bfloat16)
        g6 = jax.random.normal(k[1], (B, 8, Nt, size, zw, cin), jnp.bfloat16)
        _ = np.asarray(core[0, seed % 16, 0, 0, :, 0])
        _ = np.asarray(g6[0, 0, seed % 16, 0, :, 0])
        return core, g6

    gsets = [mkg(s) for s in range(2)]
    log("gathered inputs forced")
    w = kern.astype(jnp.bfloat16)
    b_arr = bias.reshape(1, cin)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for chunk in (4096, 8192, 40960):
        n_chunks = Nt // chunk

        def f_pallas(core_all, g_all, chunk=chunk, n_chunks=n_chunks):
            kernel_fn = functools.partial(
                PC._dense_kernel, tb=tb, cin=cin, cout=cin, relu=True,
                size=size)
            call = pl.pallas_call(
                kernel_fn,
                grid=(B, chunk // tb),
                in_specs=[
                    pl.BlockSpec((1, tb, size, size, zw, cin),
                                 lambda b, i: (b, i, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, tb, size, zw, cin),
                                 lambda b, i: (b, 0, i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((27, cin, cin), lambda b, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, cin), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tb, size**3, cin),
                                       lambda b, i: (b, i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, chunk, size**3, cin),
                                               jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((tb, size + 2, size + 2, zw, cin),
                                           jnp.bfloat16)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )

            def body(ci):
                start = ci * chunk
                core = jax.lax.dynamic_slice(
                    core_all, (0, start, 0, 0, 0, 0),
                    (B, chunk, size, size, zw, cin))
                g = jax.lax.dynamic_slice(
                    g_all, (0, 0, start, 0, 0, 0),
                    (B, 8, chunk, size, zw, cin))
                return call(core, g, w, b_arr)

            if n_chunks == 1:
                return body(0)
            out = jax.lax.map(body, jnp.arange(n_chunks))
            return jnp.moveaxis(out, 0, 1).reshape(B, Nt, size**3, cin)

        bench(f"pallas-mm-only chunk={chunk}", jax.jit(f_pallas), gsets,
              flops=flops)

    # 6. mask+reshape post-pass
    def mko(seed):
        k = jax.random.split(jax.random.PRNGKey(200 + seed), 2)
        raw = jax.random.normal(k[0], (B, Nt, size**3, cin), jnp.bfloat16)
        m = jax.random.uniform(k[1], (B, Nt, size**3)) < 0.5
        _ = np.asarray(raw[0, seed % 16, 0, :4])
        _ = np.asarray(m[0, 0, :4])
        return raw, m

    osets = [mko(s) for s in range(3)]

    def f_mask(raw, m):
        out = raw * m.astype(raw.dtype)[..., None]
        return out.reshape(B, Nt, size**3 * cin)
    bench("mask-postpass(full)", jax.jit(f_mask), osets)


if __name__ == "__main__":
    main()
