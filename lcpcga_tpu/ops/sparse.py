"""Fixed-capacity batched sparse voxel tensors.

TPU-native core type replacing MinkowskiEngine's ``SparseTensor``
(reference: external dependency of
mic-rud/Learned-Compression-of-Point-Cloud-Geometry-and-Attributes,
see /root/reference/model/*.py). Design:

  * the batch is a dense leading axis — ``feats: [B, N, C]`` — so every
    op is a ``vmap`` of a single-item op and data parallelism over a
    ``jax.sharding.Mesh`` is just sharding axis 0;
  * each item owns ``count[b]`` valid rows, stored *first* and sorted
    ascending by packed coordinate key (ops/coords.py); padding rows
    carry ``INVALID_KEY`` and zero features;
  * all shapes are static: capacities per stride level are part of the
    compiled program, with drop-on-overflow semantics (callers size
    capacities generously; see ``CapacitySchedule``).

The canonical sorted order replaces both ME's nondeterministic
kernel-map order *and* the reference's explicit re-sorting before
entropy coding (/root/reference/utils.py:155-204,
/root/reference/model/entropy_models.py:12-102).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

from . import coords as C


@struct.dataclass
class SparseTensor:
    """Batched sparse voxel tensor (see module docstring).

    Attributes
    ----------
    keys:   [B, N] int32, per item sorted ascending, INVALID_KEY padding.
    feats:  [B, N, C] float features, zero at padding rows.
    count:  [B] int32 number of valid rows per item.
    stride: static tensor stride (power of two voxel quantization).
    space_bits: static per-axis coordinate bound (coords < 2**space_bits).
        Small spaces (128^3 training cubes: 7) let membership ops use a
        dense rank volume instead of binary search (coords.lookup_in).
    """

    keys: jax.Array
    feats: jax.Array
    count: jax.Array
    stride: int = struct.field(pytree_node=False, default=1)
    space_bits: int = struct.field(pytree_node=False, default=C.COORD_BITS)

    @property
    def capacity(self) -> int:
        return self.keys.shape[1]

    @property
    def batch_size(self) -> int:
        return self.keys.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    @property
    def coords(self) -> jax.Array:
        """[B, N, 3] int32 voxel coordinates (garbage at padding rows)."""
        return C.unpack(self.keys)

    @property
    def valid(self) -> jax.Array:
        """[B, N] bool validity mask."""
        return self.keys != C.INVALID_KEY

    def with_feats(self, feats: jax.Array, stride: int | None = None) -> "SparseTensor":
        """Same coordinate set, new features (zeroed on padding rows)."""
        feats = jnp.where(self.valid[..., None], feats, 0)
        return SparseTensor(
            keys=self.keys,
            feats=feats,
            count=self.count,
            stride=self.stride if stride is None else stride,
            space_bits=self.space_bits,
        )


def _sort_item(keys, feats):
    order = jnp.argsort(keys)
    return keys[order], feats[order]


def _dedup_item(keys, feats):
    """Keep first occurrence of each key (keys already sorted)."""
    keep = C.unique_mask_sorted(keys)
    n = keys.shape[0]
    keys_out, src, count = C.compact_keys(keys, keep, n)
    feats_pad = jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
    return keys_out, feats_pad[src], count


def from_coords(
    coords: jax.Array,
    feats: jax.Array,
    valid: jax.Array,
    stride: int = 1,
    dedup: bool = True,
    space_bits: int = C.COORD_BITS,
) -> SparseTensor:
    """Build a canonical SparseTensor from batched padded raw data.

    coords: [B, N, 3] int32, feats: [B, N, C], valid: [B, N] bool.
    Equivalent of ME sparse_collate + SparseTensor construction
    (/root/reference/train.py:185-187).

    space_bits declares the per-axis coordinate bound (coords must be
    < 2**space_bits); rows outside it are treated as invalid, keeping
    the dense-lookup invariant (every valid key < 8**space_bits).
    """
    keys = jax.vmap(C.pack_valid)(coords, valid)
    if space_bits < C.COORD_BITS:
        keys = jnp.where(keys < (1 << (3 * space_bits)), keys, C.INVALID_KEY)
    keys, feats = jax.vmap(_sort_item)(keys, jnp.where(valid[..., None], feats, 0))
    if dedup:
        keys, feats, count = jax.vmap(_dedup_item)(keys, feats)
    else:
        count = jnp.sum(keys != C.INVALID_KEY, axis=-1).astype(jnp.int32)
    return SparseTensor(keys=keys, feats=feats, count=count, stride=stride,
                        space_bits=space_bits)


# ---------------------------------------------------------------------------
# Gather / lookup
# ---------------------------------------------------------------------------


def gather_rows(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather with miss-row convention: idx == N reads zeros.

    feats: [B, N, C], idx: [B, M] (or [B, M, K]) -> [B, M, C] ([B, M, K, C]).
    """
    pad = jnp.concatenate([feats, jnp.zeros_like(feats[:, :1])], axis=1)

    def g(f, i):
        return jnp.take(f, i, axis=0)

    return jax.vmap(g)(pad, idx)


def features_at(st: SparseTensor, query_keys: jax.Array) -> jax.Array:
    """Features of ``st`` at the query coordinate keys; zeros where absent.

    Replaces ``SparseTensor.features_at_coordinates``
    (e.g. /root/reference/model/blocks.py:37,
    /root/reference/model/transforms.py:124).
    """
    idx = jax.vmap(lambda tk, qk: C.lookup_in(
        tk, qk, st.space_bits, st.stride, st.batch_size))(st.keys, query_keys)
    return gather_rows(st.feats, idx)


def contains(st: SparseTensor, query_keys: jax.Array) -> jax.Array:
    """[B, M] bool — query key present in st (isin on packed keys,
    /root/reference/model/blocks.py:118-125)."""
    idx = jax.vmap(lambda tk, qk: C.lookup_in(
        tk, qk, st.space_bits, st.stride, st.batch_size))(st.keys, query_keys)
    return idx < st.capacity


# ---------------------------------------------------------------------------
# Kernel maps
# ---------------------------------------------------------------------------


def kernel_map(
    in_st: SparseTensor,
    out_keys: jax.Array,
    offsets: jax.Array,
) -> jax.Array:
    """Neighbor index table [B, M, K] for a conv evaluated at out_keys.

    For output row o and kernel tap k the input row index of coordinate
    ``coord(o) + offsets[k]`` (or in_st.capacity when absent — gathers
    read zero). This is MinkowskiEngine's kernel map, built once per
    (coordinate set, offset table) and reused by every conv sharing it.
    """
    out_coords = C.unpack(out_keys)  # [B, M, 3]
    q = out_coords[:, :, None, :] + offsets[None, None, :, :]  # [B, M, K, 3]
    out_valid = out_keys != C.INVALID_KEY

    def per_item(table_keys, qc, ov):
        qk = C.pack_valid(qc.reshape(-1, 3), jnp.repeat(ov, offsets.shape[0]))
        return C.lookup_in(table_keys, qk, in_st.space_bits, in_st.stride,
                           in_st.batch_size).reshape(qc.shape[0], qc.shape[1])

    return jax.vmap(per_item)(in_st.keys, q, out_valid)


def self_kernel_map(st: SparseTensor, kernel_size: int = 3) -> jax.Array:
    """Kernel map for stride-1 convs on st's own coordinate set."""
    offs = C.conv_offsets(kernel_size, st.stride)
    return kernel_map(st, st.keys, offs)


def downsample_map(st: SparseTensor, capacity: int, kernel_size: int = 3):
    """Coordinate set + kernel map for a stride-2 conv (ME kernel3/stride2,
    e.g. /root/reference/model/transforms.py:49-51).

    Output coords = dedup(floor(c / 2s) * 2s); window = out + {-s,0,s}^3.
    Returns (out_keys [B, capacity], out_count [B], nbr [B, capacity, K]).
    """
    s2 = st.stride * 2

    def per_item(keys):
        # Morton downsampling is a monotone bit-mask: already sorted.
        dkeys = C.downsample_keys(keys, s2)
        keep = C.unique_mask_sorted(dkeys)
        out_keys, _, count = C.compact_keys(dkeys, keep, capacity)
        return out_keys, count

    out_keys, out_count = jax.vmap(per_item)(st.keys)
    offs = C.conv_offsets(kernel_size, st.stride)
    out_st = SparseTensor(
        keys=out_keys,
        feats=jnp.zeros(out_keys.shape + (0,), st.feats.dtype),
        count=out_count,
        stride=s2,
        space_bits=st.space_bits,
    )
    nbr = kernel_map(st, out_keys, offs)
    return out_st, nbr


def union_coords(a: SparseTensor, b: SparseTensor, capacity: int) -> SparseTensor:
    """Coordinate-set union of two tensors at the same stride
    (featureless result). Used by the sparse SSIM loss
    (/root/reference/loss.py:308: union of GT and prediction coords)."""
    assert a.stride == b.stride

    def per_item(ka, kb):
        merged = jnp.sort(jnp.concatenate([ka, kb]))
        keep = C.unique_mask_sorted(merged)
        out_keys, _, count = C.compact_keys(merged, keep, capacity)
        return out_keys, count

    keys, count = jax.vmap(per_item)(a.keys, b.keys)
    return SparseTensor(
        keys=keys,
        feats=jnp.zeros(keys.shape + (0,), a.feats.dtype),
        count=count,
        stride=a.stride,
        # max: a larger declared space is always correct — min would
        # leave union keys >= 8**space_bits, breaking the dense-lookup
        # invariant (ADVICE r4 #2).
        space_bits=max(a.space_bits, b.space_bits),
    )


def downsample_coords_only(st: SparseTensor, capacity: int) -> SparseTensor:
    """Coordinate-only stride-2 downsample (no kernel map).

    Used for the ground-truth occupancy pyramid in training
    (/root/reference/model/transforms.py:297-300 runs an untrained
    stride-2 conv purely for its output coordinates) and for the
    decoder's z-coordinate re-derivation
    (/root/reference/model/model.py:188-191).
    """
    s2 = st.stride * 2

    def per_item(keys):
        # Morton downsampling is a monotone bit-mask: already sorted.
        dkeys = C.downsample_keys(keys, s2)
        keep = C.unique_mask_sorted(dkeys)
        out_keys, _, count = C.compact_keys(dkeys, keep, capacity)
        return out_keys, count

    out_keys, out_count = jax.vmap(per_item)(st.keys)
    return SparseTensor(
        keys=out_keys,
        feats=jnp.zeros(out_keys.shape + (0,), st.feats.dtype),
        count=out_count,
        stride=s2,
        space_bits=st.space_bits,
    )


def transpose_map(
    in_st: SparseTensor,
    out_keys: jax.Array,
    kernel_size: int = 3,
) -> jax.Array:
    """Kernel map for a stride-2 *transposed* conv onto given target coords.

    Output stride t = in.stride // 2; tap k contributes W[k] @ in[o - off_k]
    with off in units of t. Covers both ME's GenerativeConvolutionTranspose
    (target = expanded candidates, /root/reference/model/blocks.py:84) and
    ConvolutionTranspose onto a known pyramid (h_s / h_q,
    /root/reference/model/entropy_models.py:134-144,296-306).
    """
    t = in_st.stride // 2
    offs = -C.conv_offsets(kernel_size, t)
    return kernel_map(in_st, out_keys, offs)


def expand_coords(st: SparseTensor, capacity: int, kernel_size: int = 3):
    """Generative upsample candidate coordinates (stride s -> s/2).

    Every input coordinate proposes kernel_size^3 children c + off*t
    (off in {-1,0,1} for k=3); out-of-range candidates are dropped,
    duplicates merged. ME: MinkowskiGenerativeConvolutionTranspose's
    coordinate expansion (/root/reference/model/blocks.py:84,152).

    Returns a featureless SparseTensor at stride s/2.
    """
    t = st.stride // 2
    offs = C.conv_offsets(kernel_size, t)
    K = offs.shape[0]

    # Candidates clip to the tensor's coordinate space (matches the
    # tiled path's cell_span clipping for small spaces). INTENTIONAL
    # divergence from the reference's unbounded ME candidate
    # enumeration (ADVICE r4 #3): in training (128^3 cubes,
    # space_bits=7) candidates of parents at coord 126/127 that fall
    # outside the cube are dropped instead of scored as focal-loss
    # negatives. Those cells can never be ground truth (the cube is
    # clipped to the same bound) and are < 0.1% of candidates on
    # surface crops; keeping them would force the slower unbounded key
    # space on every training membership op.
    cells = 1 << (3 * st.space_bits)

    def per_item(keys):
        coords = C.unpack(keys)
        cand = coords[:, None, :] + offs[None, :, :]  # [N, K, 3]
        v = jnp.repeat(keys != C.INVALID_KEY, K)
        ck = C.pack_valid(cand.reshape(-1, 3), v)
        if st.space_bits < C.COORD_BITS:
            ck = jnp.where(ck < cells, ck, C.INVALID_KEY)
        ck = jnp.sort(ck)
        keep = C.unique_mask_sorted(ck)
        out_keys, _, count = C.compact_keys(ck, keep, capacity)
        return out_keys, count

    out_keys, out_count = jax.vmap(per_item)(st.keys)
    return SparseTensor(
        keys=out_keys,
        feats=jnp.zeros(out_keys.shape + (0,), st.feats.dtype),
        count=out_count,
        stride=t,
        space_bits=st.space_bits,
    )


# ---------------------------------------------------------------------------
# Pruning / top-k
# ---------------------------------------------------------------------------


def _float_key(x: jax.Array) -> jax.Array:
    """Monotone float32 -> uint32 mapping (total order, NaN-free input)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    sign = (b >> 31).astype(jnp.uint32)
    return jnp.where(sign == 1, ~b, b | jnp.uint32(0x80000000))


def topk_mask_flat(scores: jax.Array, valid: jax.Array, k: jax.Array) -> jax.Array:
    """Exact top-k mask per batch row WITHOUT sorting: 4-round radix
    select on the order-preserving uint32 float keys (each round counts
    256 buckets with compare-reductions — O(N) total work vs the
    O(N log N) double argsort over ~24M candidate logits in the decoder;
    VERDICT r1 next-step #9).

    scores [B, M] float, valid [B, M] bool, k [B] int. Ties at the
    threshold value keep the LOWEST index — identical selection to
    ``jnp.argsort(-s, stable=True)`` rank < k.
    """
    B, M = scores.shape
    CHUNK = 1 << 20
    n_chunks = -(-M // CHUNK)
    pad = n_chunks * CHUNK - M
    key = jnp.where(valid, _float_key(scores), jnp.uint32(0))
    key = jnp.pad(key, ((0, 0), (0, pad)))
    bins = jnp.arange(256, dtype=jnp.int32)

    def per_item(key_i, k_i):
        prefix = jnp.uint32(0)
        remaining = k_i.astype(jnp.int32)
        kc = key_i.reshape(n_chunks, -1)
        # 4 radix rounds, high byte first (invalid rows carry key 0 and
        # never outrank a real key except k > #valid, where everything
        # valid is kept anyway).
        for shift in (24, 16, 8, 0):
            if shift == 24:
                def count_chunk(kk, prefix=prefix):
                    byte = ((kk >> 24) & jnp.uint32(0xFF)).astype(jnp.int32)
                    return jnp.sum(byte[:, None] == bins[None, :], axis=0)
            else:
                high = jnp.uint32((0xFFFFFFFF << (shift + 8)) & 0xFFFFFFFF)

                def count_chunk(kk, prefix=prefix, high=high, shift=shift):
                    in_pref = (kk & high) == prefix
                    byte = ((kk >> shift) & jnp.uint32(0xFF)).astype(jnp.int32)
                    return jnp.sum(
                        (byte[:, None] == bins[None, :]) & in_pref[:, None],
                        axis=0,
                    )

            counts = jnp.sum(jax.lax.map(count_chunk, kc), axis=0)  # [256]
            desc = jnp.cumsum(counts[::-1])[::-1]  # desc[b] = # byte >= b
            sel = jnp.max(jnp.where(desc >= remaining, bins, -1))
            sel = jnp.maximum(sel, 0)
            above = jnp.where(sel < 255, desc[jnp.minimum(sel + 1, 255)], 0)
            remaining = remaining - above
            prefix = prefix | (sel.astype(jnp.uint32) << shift)
        # prefix == exact k-th largest key; remaining = how many of the
        # ties at that key to keep (lowest index first).
        gt = key_i > prefix
        eq = key_i == prefix
        eq_rank = jnp.cumsum(eq.astype(jnp.int32)) * eq.astype(jnp.int32)
        keep = gt | (eq & (eq_rank <= remaining))
        return keep & (k_i > 0)

    keep = jax.vmap(per_item)(key, k)[:, :M]
    # Invalid rows have key 0; exclude them (they can slip in when
    # k exceeds the valid count).
    return keep & valid


def topk_mask(st: SparseTensor, scores: jax.Array, k: jax.Array) -> jax.Array:
    """[B, N] bool — top-k[b] valid rows of each item by score.

    Per-batch top-k with ragged k (k arrives from the bitstream at decode
    time). Replaces the Python loop in
    /root/reference/model/blocks.py:130-150 (``_topk_prediction``) with a
    sort-free radix select that stays inside jit.
    """
    return topk_mask_flat(scores, st.valid, k)


def prune(st: SparseTensor, keep: jax.Array, capacity: int) -> SparseTensor:
    """Compact kept rows into a fresh buffer (MinkowskiPruning,
    /root/reference/model/blocks.py:90,101-128)."""

    def per_item(keys, feats, kp):
        keys_out, src, count = C.compact_keys(keys, kp & (keys != C.INVALID_KEY), capacity)
        feats_pad = jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
        return keys_out, feats_pad[src], count

    keys, feats, count = jax.vmap(per_item)(st.keys, st.feats, keep)
    return SparseTensor(keys=keys, feats=feats, count=count, stride=st.stride,
                        space_bits=st.space_bits)


def prune_to_coords(st: SparseTensor, target_keys: jax.Array, capacity: int) -> SparseTensor:
    """Keep rows whose coordinate appears in target_keys (sorted key table)."""

    def isin(keys, table):
        idx = C.lookup(table, keys)
        return idx < table.shape[0]

    keep = jax.vmap(isin)(st.keys, target_keys)
    return prune(st, keep, capacity)


# ---------------------------------------------------------------------------
# Capacity planning
# ---------------------------------------------------------------------------


def round_up(n: int, m: int = 128) -> int:
    return ((n + m - 1) // m) * m


class CapacitySchedule:
    """Static per-stride row capacities for one compiled program.

    JAX requires static shapes; occupancy per stride level is dynamic.
    The schedule fixes a generous buffer per level (surfaces shrink
    roughly 4x per downsample; defaults use 2x for safety). Overflow
    drops the spatially-largest coordinates (sorted-key order) — sizing
    must make that unreachable in practice.
    """

    def __init__(self, n_points: int, factors: Sequence[float] = (1.0, 1.0, 0.5, 0.3, 0.15, 0.15)):
        # factors indexed by log2(stride): stride 1, 2, 4, 8, 16, 32
        self.base = round_up(n_points)
        self.factors = factors

    def cap(self, stride: int) -> int:
        import math

        level = int(math.log2(stride))
        f = self.factors[min(level, len(self.factors) - 1)]
        return max(128, round_up(int(self.base * f)))
