"""Real-TPU validation of the fused Pallas tile-conv kernels.

Compiles the three kernels (dense 27-tap, transposed/generative,
packed 2^3-support) through Mosaic on the actual chip and checks
numerics against the XLA reference path in ops/tiles.py. Run after any
pallas_conv.py change: the interpreter accepts ops Mosaic rejects.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from lcpcga_tpu.ops import pallas_conv as PC
    from lcpcga_tpu.ops import tiles as TL

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    B, Nt, size, cin, cout = 1, 256, 4, 64, 64
    feats = jnp.asarray(
        rng.standard_normal((B, Nt, size**3 * cin), np.float32) * 0.3,
        jnp.bfloat16,
    )
    nbr = jnp.asarray(rng.integers(0, Nt + 40, (B, 26, Nt)), jnp.int32)
    kern = jnp.asarray(rng.standard_normal((27, cin, cout), np.float32) * 0.05)
    bias = jnp.asarray(rng.standard_normal(cout, np.float32) * 0.1)
    mask = jnp.asarray(rng.random((B, Nt, size**3)) < 0.5)
    maskT = jnp.asarray(rng.random((B, Nt, 64)) < 0.5)  # child tiles 4^3

    def cmp(name, a, b, rtol=0.05, atol=0.05):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        err = np.max(np.abs(a - b))
        ok = np.allclose(a, b, rtol=rtol, atol=atol)
        log(f"{name}: max|d|={err:.4f} {'OK' if ok else 'MISMATCH'}")
        if not ok:
            raise SystemExit(f"{name} mismatch")

    # dense 27-tap
    ref = jax.jit(lambda f, n, m: TL.dense_conv(f, n, kern, bias, mask=m,
                                                relu=True))(feats, nbr, mask)
    got = jax.jit(lambda f, n, m: PC.tile_conv(
        f, n, kern, bias, m.astype(jnp.bfloat16), size=size, relu=True
    ))(feats, nbr, mask)
    cmp("dense", ref, got)

    # transposed / generative (parent tiles are PTILE=2)
    pfeats = jnp.asarray(
        rng.standard_normal((B, Nt, 8 * cin), np.float32) * 0.3, jnp.bfloat16)
    refT = jax.jit(lambda f, n, m: TL.transpose_dense_conv(
        f, n, kern, bias, mask=m))(pfeats, nbr, maskT)
    gotT = jax.jit(lambda f, n, m: PC.tile_conv(
        f, n, kern, bias, m.astype(jnp.bfloat16), size=2, transpose=True
    ))(pfeats, nbr, maskT)
    cmp("transpose", refT, gotT)

    # packed 2^3-support (stride-2 analysis)
    kern8 = jnp.asarray(
        rng.standard_normal((8, cin, cout), np.float32) * 0.05)
    ref2 = jax.jit(lambda f, n, m: TL.dense_conv2(
        f, n, kern8, bias, mask=m, relu=True))(feats, nbr, mask)
    got2 = jax.jit(lambda f, n, m: PC.tile_conv2(
        f, n, kern8, bias, m.astype(jnp.bfloat16), size=size, relu=True
    ))(feats, nbr, mask)
    cmp("conv2", ref2, got2)
    log("all kernels OK on TPU")


if __name__ == "__main__":
    main()
