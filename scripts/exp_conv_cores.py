"""Re-measure tile-conv core formulations with the CORRECT axon timing
protocol (round-2 numbers used block-only timing on unforced inputs and
are unreliable — see .claude/skills/verify/SKILL.md).

Variants at Nt tiles x C channels (vox10-representative):
  v0   ops/tiles.dense_conv (27 sliced einsums, halo-slab takes)
  v3   lax.conv_general_dilated on per-chunk halo blocks
  p0   pallas tile_conv (z-ext halo kernel, lax.map chunks)
  mm   pallas kernel alone on pre-gathered slabs (upper bound)

Usage: python scripts/exp_conv_cores.py [Nt] [C] [variants]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench(name, fn, input_sets, iters=6, flops=0):
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
    dt = (time.time() - t0) / iters
    extra = f"  ({flops/dt/1e12:.1f} TF/s)" if flops else ""
    log(f"{name}: compile {t_compile:.1f}s, run {dt*1000:.2f}ms{extra}")
    return dt


def main(Nt=40960, cin=64, variants="v0,v3,p0"):
    only = set(variants.split(","))
    from lcpcga_tpu.ops import tiles as TL

    B, size = 1, 4
    cout = cin
    log(f"backend={jax.default_backend()} Nt={Nt} C={cin} variants={only}")

    kern = jax.random.normal(jax.random.PRNGKey(99), (27, cin, cout),
                             jnp.float32) * 0.05
    bias = jnp.zeros((cout,), jnp.float32)
    _ = np.asarray(kern[0, 0, :4])

    def mk(seed):
        k = jax.random.split(jax.random.PRNGKey(seed), 3)
        f = jax.random.normal(k[0], (B, Nt, size**3 * cin), jnp.bfloat16)
        n = jax.random.randint(k[1], (B, 26, Nt), 0, Nt + 1, jnp.int32)
        m = (jax.random.uniform(k[2], (B, Nt, size**3)) < 0.5)
        _ = np.asarray(f[0, seed % 16, :4])
        _ = np.asarray(n[0, 0, :4])
        _ = np.asarray(m[0, 0, :4])
        return f, n, m

    sets = [mk(s) for s in range(3)]
    log("inputs forced")
    flops = 2 * B * Nt * size**3 * 27 * cin * cout

    if "v0" in only:
        v0 = jax.jit(lambda f, n, m: TL.dense_conv(
            f, n, kern, bias, mask=m, relu=True))
        bench("v0 xla dense_conv", v0, sets, flops=flops)

    if "v3" in only:
        CHUNK = 4096
        n_chunks = -(-Nt // CHUNK)
        pad_tiles = n_chunks * CHUNK - Nt
        Wc = kern.reshape(3, 3, 3, cin, cout).astype(jnp.bfloat16)

        def v3_fn(f, n, m):
            fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))
            nbrp = jnp.pad(n, ((0, 0), (0, 0), (0, pad_tiles)),
                           constant_values=Nt)
            slabs = TL._extract_slabs(fp, size, cin)

            def do_chunk(ci):
                halo = TL._build_halo_slabs(
                    fp, slabs, nbrp, ci * CHUNK, CHUNK, size, cin, B, Nt,
                    pad_tiles)
                h = halo.reshape(B * CHUNK, size + 2, size + 2, size + 2, cin)
                out = jax.lax.conv_general_dilated(
                    h, Wc, (1, 1, 1), "VALID",
                    dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
                    preferred_element_type=jnp.float32,
                )
                out = out.reshape(B, CHUNK, size**3, cout) + bias
                mm = jax.lax.dynamic_slice(m, (0, ci * CHUNK, 0),
                                           (B, CHUNK, size**3))
                out = jnp.maximum(out, 0.0) * mm[..., None]
                return out.astype(f.dtype).reshape(B, CHUNK, size**3 * cout)

            chunks = jax.lax.map(do_chunk, jnp.arange(n_chunks))
            return jnp.moveaxis(chunks, 0, 1).reshape(
                B, n_chunks * CHUNK, -1)[:, :Nt]

        # mask needs padding too when Nt isn't chunk-aligned
        def v3_wrap(f, n, m):
            mp = jnp.pad(m, ((0, 0), (0, pad_tiles), (0, 0)))
            return v3_fn(f, n, mp)

        bench("v3 xla conv3d", jax.jit(v3_wrap), sets, flops=flops)

    if "p0" in only:
        raise SystemExit('pallas kernels retired in round 5 (see ops/tiles.py note)')

        p0 = jax.jit(lambda f, n, m: PC.tile_conv(
            f, n, kern, bias, m.astype(jnp.bfloat16), size=size, relu=True))
        bench("p0 pallas tile_conv", p0, sets, flops=flops)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 40960,
         int(a[1]) if len(a) > 1 else 64,
         a[2] if len(a) > 2 else "v0,v3,p0")
