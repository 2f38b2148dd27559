"""Split the tile-conv cost: halo assembly vs the conv3d core vs the
full dense_conv (axon timing protocol: forced on-device inputs, varied
across calls, one block at the end).

The dense_conv formulation measures ~11/20 TF/s at C=64/128 INCLUDING
halo assembly. If assembly dominates, a Pallas fused halo+matmul kernel
(VMEM halo, no HBM intermediate) is the next lever; if conv3d
dominates, the MXU shape (K=N=C) is the wall and padding to C=128 /
int8 are the levers.

Usage: python scripts/exp_halo_split.py [Nt] [C]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench(name, fn, input_sets, iters=6, flops=0):
    import jax

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


def main(Nt=40960, cin=64):
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu.ops import tiles as TL

    B, size = 1, 4
    cout = cin
    log(f"backend={jax.default_backend()} Nt={Nt} C={cin}")

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

    CHUNK = TL._pick_chunk(Nt, TL._chunk_target(size, cin))
    n_chunks = -(-Nt // CHUNK)
    pad_tiles = n_chunks * CHUNK - Nt
    log(f"chunk={CHUNK} n_chunks={n_chunks}")
    Wc = kern.reshape(3, 3, 3, cin, cout).astype(jnp.bfloat16)

    # (a) halo assembly only (checksum to defeat DCE)
    def halo_only(f, n, m):
        fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))
        nbrp = jnp.pad(n, ((0, 0), (0, 0), (0, pad_tiles)), constant_values=Nt)
        slabs = TL._extract_slabs(fp, size, cin)

        def do_chunk(ci):
            halo = TL._build_halo_slabs(fp, slabs, nbrp, ci * CHUNK, CHUNK,
                                        size, cin, B, Nt, pad_tiles)
            return jnp.sum(halo.astype(jnp.float32), axis=(2, 3, 4, 5))

        return jax.lax.map(do_chunk, jnp.arange(n_chunks))

    bench("halo assembly only", jax.jit(halo_only), sets, flops=flops)

    # (b) conv3d core on a fixed pre-built halo block (per chunk, no
    # assembly): upper bound of the conv core.
    def conv_only(f, n, m):
        fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))

        def do_chunk(ci):
            core = jax.lax.dynamic_slice(
                fp, (0, ci * CHUNK, 0), (B, CHUNK, size**3 * cin))
            # fake halo: pad the core spatially (zero halo) — same conv
            # shape as the real thing without neighbor gathers.
            h = core.reshape(B * CHUNK, size, size, size, cin)
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
            out = jax.lax.conv_general_dilated(
                h, Wc, (1, 1, 1), "VALID",
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(out, axis=(1, 2, 3, 4))

        return jax.lax.map(do_chunk, jnp.arange(n_chunks))

    bench("conv3d core (zero halo)", jax.jit(conv_only), sets, flops=flops)

    # (c) full dense_conv with live-skip off and on
    v_full = jax.jit(lambda f, n, m: TL.dense_conv(
        f, n, kern, bias, mask=m, relu=True))
    bench("dense_conv (live=None)", v_full, sets, flops=flops)

    live = jnp.asarray([int(Nt * 0.7)], jnp.int32)
    v_live = jax.jit(lambda f, n, m: TL.dense_conv(
        f, n, kern, bias, mask=m, relu=True, live=live))
    bench("dense_conv (live=0.7Nt)", v_live, sets, flops=flops)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 40960, int(a[1]) if len(a) > 1 else 64)
