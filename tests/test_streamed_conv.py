"""Streamed conv must match the materialized-kernel-map path exactly."""

import numpy as np
import jax.numpy as jnp

from lcpcga_tpu import ops
from lcpcga_tpu.ops import coords as C
from tests.test_sparse_ops import build_st, make_cloud


def test_streamed_equals_materialized_self():
    rng = np.random.default_rng(0)
    p, f = make_cloud(rng, 80, lim=32, c=6)
    st = build_st([(p, f)], capacity=128)
    W = jnp.asarray(rng.standard_normal((27, 6, 4)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    nbr = ops.self_kernel_map(st)
    dense = ops.sparse_conv_apply(st.feats, nbr, W, b, st.valid)
    offs = C.conv_offsets(3, 1)
    streamed = ops.sparse_conv_streamed(st, st, offs, W, b, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(streamed), rtol=1e-5, atol=1e-6)


def test_streamed_equals_materialized_transpose():
    rng = np.random.default_rng(1)
    p, f = make_cloud(rng, 40, lim=64, c=5, stride=2)
    st = build_st([(p, f)], capacity=64, stride=2)
    up = ops.expand_coords(st, capacity=27 * 64)
    W = jnp.asarray(rng.standard_normal((27, 5, 3)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    nbr = ops.transpose_map(st, up.keys)
    dense = ops.sparse_conv_apply(st.feats, nbr, W, b, up.valid)
    offs = -C.conv_offsets(3, 1)
    streamed = ops.sparse_conv_streamed(st, up, offs, W, b, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(streamed), rtol=1e-5, atol=1e-6)


def test_streamed_bf16_close():
    rng = np.random.default_rng(2)
    p, f = make_cloud(rng, 60, lim=32, c=8)
    st = build_st([(p, f)], capacity=128)
    W = jnp.asarray(rng.standard_normal((27, 8, 4)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    offs = C.conv_offsets(3, 1)
    exact = ops.sparse_conv_streamed(st, st, offs, W, b, compute_dtype=jnp.float32)
    bf16 = ops.sparse_conv_streamed(st, st, offs, W, b)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(bf16), rtol=0.05, atol=0.02)


def test_streamed_chunk_boundary():
    """Row counts not divisible by the chunk size pad internally."""
    import lcpcga_tpu.ops.conv as conv_mod

    rng = np.random.default_rng(3)
    p, f = make_cloud(rng, 90, lim=32, c=4)
    st = build_st([(p, f)], capacity=160)
    W = jnp.asarray(rng.standard_normal((27, 4, 4)).astype(np.float32) * 0.1)
    offs = C.conv_offsets(3, 1)
    full = ops.sparse_conv_streamed(st, st, offs, W, None, compute_dtype=jnp.float32)
    old = conv_mod.STREAM_CHUNK
    try:
        conv_mod.STREAM_CHUNK = 48  # forces 4 chunks with padding
        chunked = ops.sparse_conv_streamed(st, st, offs, W, None, compute_dtype=jnp.float32)
    finally:
        conv_mod.STREAM_CHUNK = old
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-5, atol=1e-6)
