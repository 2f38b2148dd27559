"""Sparse convolution apply + flax modules.

TPU-native replacement for MinkowskiConvolution /
MinkowskiGenerativeConvolutionTranspose / MinkowskiAvgPooling (external
MinkowskiEngine dependency of the reference; used by every layer in
/root/reference/model/). A convolution here is a pure gather-GEMM over a
precomputed kernel map (ops/sparse.kernel_map):

    out[m] = bias + sum_k  W[k] @ feats[nbr[m, k]]

with the miss convention nbr == N reading a zero row. Two execution
paths:

  * ``im2col``: one [B, M, K*Cin] x [K*Cin, Cout] matmul — maximal MXU
    utilization, used when the gathered buffer fits comfortably in HBM;
  * ``scan``: accumulate over the K taps — O(M*Cout) live memory, used
    at full voxel resolution (~1M points x 27 taps).

Weight layout [K, Cin, Cout]; K = kernel_size**3 taps ordered
lexicographically (ops/coords.conv_offsets).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import coords as C
from .sparse import SparseTensor, gather_rows

# Gathered im2col buffers up to this many elements use the single-matmul
# path (f32: 64 MB per 16M elements).
IM2COL_ELEMENT_LIMIT = 1 << 25


def sparse_conv_apply(
    feats: jax.Array,
    nbr: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    out_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Apply a sparse conv. feats [B,N,Cin], nbr [B,M,K], kernel [K,Cin,Cout].

    Returns [B, M, Cout]; rows where ``out_valid`` is False are zeroed.
    """
    B, M, K = nbr.shape
    Cin = feats.shape[-1]
    Cout = kernel.shape[-1]
    compute_dtype = feats.dtype

    pad = jnp.concatenate([feats, jnp.zeros_like(feats[:, :1])], axis=1)

    if B * M * K * Cin <= IM2COL_ELEMENT_LIMIT:
        gathered = gather_rows(feats, nbr)  # [B, M, K, Cin]
        out = jnp.einsum(
            "bmki,kio->bmo",
            gathered,
            kernel.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        def body(carry, k):
            acc = carry
            idx = jax.lax.dynamic_index_in_dim(nbr, k, axis=2, keepdims=False)
            g = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(pad, idx)  # [B,M,Cin]
            w = jax.lax.dynamic_index_in_dim(kernel, k, axis=0, keepdims=False)
            acc = acc + jnp.einsum(
                "bmi,io->bmo", g, w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            return acc, None

        init = jnp.zeros((B, M, Cout), jnp.float32)
        out, _ = jax.lax.scan(body, init, jnp.arange(K))

    out = out.astype(compute_dtype)
    if bias is not None:
        out = out + bias.astype(compute_dtype)
    if out_valid is not None:
        out = jnp.where(out_valid[..., None], out, 0)
    return out


# Output rows processed per chunk in the streamed conv. Transients per
# chunk are O(chunk * Cin) — small enough that several 10M-row candidate
# sets fit HBM alongside their outputs.
STREAM_CHUNK = 1 << 19


def sparse_conv_streamed(
    in_st,
    out_st,
    offsets: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Sparse conv with per-tap kernel-map construction, chunked over
    output rows.

    Equivalent to kernel_map + sparse_conv_apply but never materializes
    the [B, M, K] neighbor table — essential on generative-upsampling
    candidate sets (M up to ~15x the point count at vox10 scale, where a
    materialized map plus gather temporaries OOMs HBM). The output rows
    are processed in STREAM_CHUNK slices; per slice and tap: query
    coords -> packed keys -> binary-search lookup -> gather (bf16) ->
    MXU GEMM accumulated in f32. Peak transient memory is
    O(chunk * Cin) regardless of M.
    """
    from . import coords as C

    out_keys = out_st.keys
    out_valid = out_st.valid
    feats = in_st.feats
    B, M = out_keys.shape
    K = offsets.shape[0]
    Cout = kernel.shape[-1]
    pad = jnp.concatenate(
        [feats.astype(compute_dtype), jnp.zeros_like(feats[:, :1], compute_dtype)],
        axis=1,
    )
    kern = kernel.astype(compute_dtype)

    chunk = min(STREAM_CHUNK, M)
    n_chunks = -(-M // chunk)
    pad_rows = n_chunks * chunk - M
    keys_p = jnp.pad(out_keys, ((0, 0), (0, pad_rows)), constant_values=C.INVALID_KEY)
    keys_c = keys_p.reshape(B, n_chunks, chunk)

    # Small (stride-reduced) coordinate spaces: one dense rank volume
    # per item, shared by every tap and chunk — O(1) lookups instead of
    # a 12-step binary search per query.
    shift = 3 * (max(1, in_st.stride).bit_length() - 1)
    cells = C.dense_cells(in_st.space_bits, in_st.stride)
    if cells * B <= C.DENSE_LOOKUP_BUDGET:
        vol = jax.vmap(lambda tk: C.rank_volume(tk, cells, shift))(in_st.keys)
        lookup_b = lambda qk: jax.vmap(
            lambda v, tk, q: C.volume_lookup(v, tk, q, shift)
        )(vol, in_st.keys, qk)
    else:
        lookup_b = lambda qk: jax.vmap(C.lookup)(in_st.keys, qk)

    def do_chunk(chunk_keys):  # [B, chunk]
        coords = C.unpack(chunk_keys)
        valid = chunk_keys != C.INVALID_KEY

        # jax.checkpoint: reverse-mode otherwise stores the gathered
        # activations of every tap (27x the chunk) — recomputing the
        # lookup+gather in the backward pass is far cheaper than HBM.
        @jax.checkpoint
        def tap(acc, k):
            off = jax.lax.dynamic_index_in_dim(offsets, k, axis=0, keepdims=False)
            qk = jax.vmap(C.pack_valid)(coords + off[None, None, :], valid)
            idx = lookup_b(qk)
            g = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(pad, idx)
            w = jax.lax.dynamic_index_in_dim(kern, k, axis=0, keepdims=False)
            return acc + jnp.einsum(
                "bmi,io->bmo", g, w, preferred_element_type=jnp.float32
            ), None

        init = jnp.zeros((B, chunk, Cout), jnp.float32)
        acc, _ = jax.lax.scan(tap, init, jnp.arange(K))
        return acc

    out = jax.lax.map(do_chunk, jnp.moveaxis(keys_c, 1, 0))  # [n_chunks, B, chunk, Cout]
    out = jnp.moveaxis(out, 0, 1).reshape(B, n_chunks * chunk, Cout)[:, :M]
    out = out.astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return jnp.where(out_valid[..., None], out, 0)


class SparseConvAt(nn.Module):
    """Streamed sparse conv onto an explicit target coordinate set.

    kernel taps in units of ``in_st.stride`` for ordinary convs, or
    negated units of ``out_st.stride`` for transposed convs.
    """

    out_channels: int
    kernel_size: int = 3
    transpose: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_st: SparseTensor, out_st: SparseTensor) -> SparseTensor:
        from . import coords as C

        if self.transpose:
            offsets = -C.conv_offsets(self.kernel_size, out_st.stride)
        else:
            offsets = C.conv_offsets(self.kernel_size, in_st.stride)
        K = offsets.shape[0]
        Cin = in_st.num_channels
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (K, Cin, self.out_channels),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            if self.use_bias
            else None
        )
        feats = sparse_conv_streamed(in_st, out_st, offsets, kernel, bias)
        return out_st.with_feats(feats)


class SparseConv(nn.Module):
    """Sparse conv layer over a precomputed kernel map.

    The caller owns geometry: ``out_st`` carries the output coordinate
    set (pass the input tensor itself for stride-1 convs) and ``nbr``
    the kernel map. Weight init matches ME's default (fan-in variance
    scaling over K*Cin).
    """

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_st: SparseTensor, out_st: SparseTensor, nbr: jax.Array) -> SparseTensor:
        K = nbr.shape[-1]
        Cin = in_st.num_channels
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (K, Cin, self.out_channels),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            if self.use_bias
            else None
        )
        feats = sparse_conv_apply(in_st.feats, nbr, kernel, bias, out_st.valid)
        return out_st.with_feats(feats)


def avg_pool(
    in_st: SparseTensor,
    out_st: SparseTensor,
    nbr: jax.Array,
) -> SparseTensor:
    """Average pooling over existing neighbors (MinkowskiAvgPooling,
    /root/reference/loss.py:156-157): mean over kernel taps that hit."""
    gathered = gather_rows(in_st.feats, nbr)  # [B, M, K, C]
    hit = (nbr < in_st.capacity).astype(gathered.dtype)  # [B, M, K]
    total = jnp.einsum("bmkc,bmk->bmc", gathered, hit)
    cnt = jnp.maximum(jnp.sum(hit, axis=-1), 1.0)
    out = total / cnt[..., None]
    out = jnp.where(out_st.valid[..., None], out, 0)
    return out_st.with_feats(out)


def _box_sum(vol: jax.Array, axes=(1, 2, 3)) -> jax.Array:
    """Separable 3^3 box-filter sum with zero boundary (6 shifted adds)."""
    for ax in axes:
        n = vol.shape[ax]
        lo = jax.lax.slice_in_dim(vol, 0, n - 1, axis=ax)
        hi = jax.lax.slice_in_dim(vol, 1, n, axis=ax)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(vol, 0, 1, axis=ax))
        vol = (vol
               + jnp.concatenate([zero, lo], axis=ax)
               + jnp.concatenate([hi, zero], axis=ax))
    return vol


def avg_pool_at(src: SparseTensor, query: SparseTensor) -> SparseTensor:
    """``avg_pool`` over the 3^3 stride-neighborhood of each QUERY
    coordinate (MinkowskiAvgPooling(kernel 3) with
    coordinates=query.C, /root/reference/loss.py:156,190): mean of
    src's features over neighbors that exist, queried at coordinates
    that need not be in src.

    Small coordinate spaces (training cubes) use a dense XYZ volume +
    separable box filter + one gather — no kernel map, no binary
    search (the sparse path measured 129 ms vs ~10 ms dense at
    [4, 36864] queries into a 4096-row table).
    """
    assert src.stride == query.stride, (src.stride, query.stride)
    cells = C.dense_cells(src.space_bits, src.stride)
    if cells * src.batch_size > C.DENSE_LOOKUP_BUDGET:
        offs = C.conv_offsets(3, src.stride)
        from .sparse import kernel_map  # local import (module cycle)

        nbr = kernel_map(src, query.keys, offs)
        return avg_pool(src, query, nbr)

    s = src.stride
    side = max(1, (1 << src.space_bits) // s)
    B = src.batch_size
    Cdim = src.num_channels
    cell = src.coords // s  # [B, N, 3] in [0, side)
    flat = (cell[..., 0] * side + cell[..., 1]) * side + cell[..., 2]
    flat = jnp.where(src.valid, flat, side**3)  # invalid -> dropped

    def scatter_item(fl, fe, va):
        vals = jnp.concatenate([fe, va[:, None].astype(fe.dtype)], axis=-1)
        vol = jnp.zeros((side**3, Cdim + 1), fe.dtype)
        return vol.at[fl].set(jnp.where(va[:, None], vals, 0), mode="drop")

    vol = jax.vmap(scatter_item)(flat, src.feats.astype(jnp.float32), src.valid)
    vol = vol.reshape(B, side, side, side, Cdim + 1)
    vol = _box_sum(vol)
    vol = vol.reshape(B, side**3, Cdim + 1)

    qcell = query.coords // s
    qflat = (qcell[..., 0] * side + qcell[..., 1]) * side + qcell[..., 2]
    qin = query.valid & jnp.all((qcell >= 0) & (qcell < side), axis=-1)
    qflat = jnp.where(qin, qflat, 0)
    g = jax.vmap(lambda v, i: jnp.take(v, i, axis=0))(vol, qflat)
    out = g[..., :Cdim] / jnp.maximum(g[..., Cdim:], 1.0)
    out = jnp.where(qin[..., None], out, 0)
    return query.with_feats(out.astype(src.feats.dtype))
