"""Coordinate keys, sorting and set algebra for sparse voxel tensors.

TPU-native replacement for MinkowskiEngine's CoordinateManager
(reference: MinkowskiEngine dependency, used throughout
/root/reference/model/*.py). Instead of a GPU hash map we keep every
coordinate set in a *canonically sorted, fixed-capacity* buffer:

  * coordinates are packed into a single int32 MORTON (z-order) key —
    the 10 bits of x, y, z bit-interleaved (x most significant) —
    injective for voxel grids up to 2**10 = 1024 per axis (vox10, the
    reference's data regime; /root/reference/utils.py:155-204 re-sorts
    with float weights ``[1e15, 1e10, 1e5, 1]`` — any injective total
    order works, both sides just have to agree);
  * rows are always sorted ascending by key with padding rows at the
    end (``INVALID_KEY = int32 max``);
  * membership / gather ops are ``searchsorted`` on the key array.

Sorted order doubles as the entropy-coding symbol order, so the
encoder/decoder enumeration contract of the reference
(/root/reference/model/entropy_models.py:12-102, ``sort_tensor``)
is an invariant here instead of a bolted-on wrapper.

Morton rather than concatenated (x<<20|y<<10|z) fields because the
order is then HIERARCHICAL: sorted keys stay sorted under coordinate
//2 (parent key = child key >> 3), and a (sorted-tiles, sorted-cells-
within-tile) enumeration of a tile grid is globally sorted — which
lets ops/tiles.extract_sparse compact dense tile volumes to canonical
rows with a cumsum instead of a full argsort (the measured decode
hotspot the x-major key forced).

All functions in this module operate on a single batch item; batch
processing happens via ``jax.vmap`` one level up (ops/sparse.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Voxel grids up to 2**COORD_BITS per axis are supported by the packed
# int32 keys. 10 bits covers vox10 (the reference's data regime). Larger
# voxel resolutions would need the (slower) lexicographic key path.
COORD_BITS = 10
COORD_RANGE = 1 << COORD_BITS  # 1024
INVALID_KEY = jnp.iinfo(jnp.int32).max


def _part1by2(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so bit i lands at bit 3i."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _compact1by2(v: jax.Array) -> jax.Array:
    """Inverse of :func:`_part1by2` (gather every 3rd bit)."""
    v = v & 0x09249249
    v = (v | (v >> 2)) & 0x030C30C3
    v = (v | (v >> 4)) & 0x0300F00F
    v = (v | (v >> 8)) & 0x030000FF
    v = (v | (v >> 16)) & 0x3FF
    return v


def pack(coords: jax.Array) -> jax.Array:
    """Pack [..., 3] int32 coords in [0, 1024)^3 into int32 Morton keys
    (bit-interleaved, x most significant). Keys fit in 30 bits, so every
    valid key < INVALID_KEY."""
    c = coords.astype(jnp.int32)
    return (
        (_part1by2(c[..., 0]) << 2)
        | (_part1by2(c[..., 1]) << 1)
        | _part1by2(c[..., 2])
    )


def unpack(keys: jax.Array) -> jax.Array:
    """Inverse of :func:`pack` (valid keys only; INVALID_KEY unpacks to
    (1023, 1023, 1023) — callers must mask by validity)."""
    x = _compact1by2(keys >> 2)
    y = _compact1by2(keys >> 1)
    z = _compact1by2(keys)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def in_range(coords: jax.Array) -> jax.Array:
    """[N] bool — True where all three coords are inside [0, 1024)."""
    return jnp.all((coords >= 0) & (coords < COORD_RANGE), axis=-1)


def pack_valid(coords: jax.Array, valid: jax.Array) -> jax.Array:
    """Pack coords, forcing rows where ``valid`` is False to INVALID_KEY."""
    keys = pack(jnp.clip(coords, 0, COORD_RANGE - 1))
    return jnp.where(valid & in_range(coords), keys, INVALID_KEY)


def lookup(table_keys: jax.Array, query_keys: jax.Array) -> jax.Array:
    """Find each query key in a sorted key table.

    Returns int32 [M] indices into ``table_keys``; misses (and invalid
    queries) return ``len(table_keys)`` — the convention is that callers
    gather from a feature buffer padded with one extra zero row.

    Replaces ``SparseTensor.features_at_coordinates`` index resolution
    (reference: MinkowskiEngine; 11+ call sites, e.g.
    /root/reference/model/blocks.py:37).
    """
    n = table_keys.shape[0]
    pos = jnp.searchsorted(table_keys, query_keys).astype(jnp.int32)
    safe = jnp.minimum(pos, n - 1)
    found = (table_keys[safe] == query_keys) & (query_keys != INVALID_KEY) & (pos < n)
    return jnp.where(found, pos, n).astype(jnp.int32)


def rank_volume(table_keys: jax.Array, cells: int, shift: int = 0) -> jax.Array:
    """Dense rank volume for O(1) key lookup: ``vol[key >> shift] = row``
    for every valid table row, ``len(table_keys)`` (miss) elsewhere.

    Usable when the (stride-reduced) coordinate space is small enough to
    materialize: ``cells`` Morton slots, e.g. 2M int32 = 8 MB for 128^3
    training cubes (shift 0) or vox10 stride-8 sets (shift 9 — Morton
    keys of stride-s coords have their low 3*log2(s) bits zero). Build
    once per table, reuse across taps.
    """
    n = table_keys.shape[0]
    valid = table_keys != INVALID_KEY
    # Invalid rows scatter out of range (mode="drop").
    slot = jnp.where(valid, table_keys >> shift, cells)
    vol = jnp.full((cells,), n, jnp.int32)
    return vol.at[slot].set(jnp.arange(n, dtype=jnp.int32), mode="drop")


def volume_lookup(vol: jax.Array, table_keys: jax.Array,
                  query_keys: jax.Array, shift: int = 0) -> jax.Array:
    """Resolve queries against a :func:`rank_volume`: one gather + one
    verification gather per query (vs the 12-step searchsorted binary
    search that measures ~150 ns/query on TPU — the
    MultiscaleFocalLoss kernel_map was 2.5 s of the 3.4 s training
    forward). The verification compares FULL keys, so queries that are
    not stride-aligned with the table correctly miss. Same miss
    convention as lookup()."""
    n = table_keys.shape[0]
    cells = vol.shape[0]
    q = query_keys >> shift
    qin = (query_keys != INVALID_KEY) & (query_keys >= 0) & (q < cells)
    pos = vol[jnp.where(qin, q, 0)]
    safe = jnp.minimum(pos, n - 1)
    found = qin & (pos < n) & (table_keys[safe] == query_keys)
    return jnp.where(found, pos, n).astype(jnp.int32)


def dense_lookup(table_keys: jax.Array, query_keys: jax.Array,
                 cells: int, shift: int = 0) -> jax.Array:
    """:func:`lookup` via a one-shot dense rank volume (see
    rank_volume/volume_lookup; misses return len(table_keys))."""
    return volume_lookup(rank_volume(table_keys, cells, shift), table_keys,
                         query_keys, shift)


# Total dense-rank-volume slots worth materializing across a batch:
# 2**25 int32 = 128 MB transient HBM. Covers 128^3 training cubes at
# batch 4 (8M slots) and vox10 sets down to stride 4 at batch 1 (16M).
DENSE_LOOKUP_BUDGET = 1 << 25
# Back-compat alias for per-item gating (ops/conv.avg_pool_at).
DENSE_LOOKUP_MAX_CELLS = 1 << 22


def dense_cells(space_bits: int, stride: int = 1) -> int:
    """Slot count of the stride-reduced Morton space (keys >> shift)."""
    shift = 3 * (max(1, stride).bit_length() - 1)
    return 1 << max(0, 3 * space_bits - shift)


def lookup_in(table_keys: jax.Array, query_keys: jax.Array,
              space_bits: int, stride: int = 1, batch: int = 1) -> jax.Array:
    """lookup() that takes the table's coordinate-space bound (and
    stride alignment) and picks the dense rank-volume path when the
    reduced space fits the batch-wide budget."""
    shift = 3 * (max(1, stride).bit_length() - 1)
    cells = 1 << max(0, 3 * space_bits - shift)
    if cells * max(1, batch) <= DENSE_LOOKUP_BUDGET:
        return dense_lookup(table_keys, query_keys, cells, shift)
    return lookup(table_keys, query_keys)


def sort_by_key(keys: jax.Array, *rows: jax.Array):
    """Sort keys ascending and apply the same permutation to row arrays."""
    order = jnp.argsort(keys)
    return (keys[order],) + tuple(r[order] for r in rows)


def unique_mask_sorted(keys: jax.Array) -> jax.Array:
    """[N] bool — True at the first occurrence of each valid key (keys sorted)."""
    first = jnp.concatenate(
        [jnp.array([True]), keys[1:] != keys[:-1]]
    )
    return first & (keys != INVALID_KEY)


def compact_keys(keys: jax.Array, keep: jax.Array, capacity: int):
    """Stable-compact kept (sorted) keys into a fresh buffer of ``capacity``.

    Rows beyond capacity are dropped (highest keys first — the caller is
    responsible for sizing capacities; see ops/sparse.py capacity notes).

    Returns (keys_out [capacity], src_idx [capacity], count).
    ``src_idx`` maps each output row to its source row (or len(keys) for
    padding), so callers can gather features alongside.
    """
    n = keys.shape[0]
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, dest, capacity)  # dropped rows -> OOB, scatter-drop
    keys_out = jnp.full((capacity,), INVALID_KEY, dtype=jnp.int32)
    keys_out = keys_out.at[dest].set(keys, mode="drop")
    src = jnp.full((capacity,), n, dtype=jnp.int32)
    src = src.at[dest].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), capacity)
    return keys_out, src, count


def downsample_keys(keys: jax.Array, stride_out: int) -> jax.Array:
    """Packed keys of the ``stride_out``-downsampled coordinates.

    Under Morton keys, quantizing coords to a power-of-two stride is a
    pure bit-mask of the key (clear the low 3*log2(stride_out) bits) —
    a MONOTONE map, so sorted inputs stay sorted (no re-sort needed
    after downsampling). INVALID_KEY rows stay INVALID."""
    shift = 3 * (stride_out.bit_length() - 1)
    down = (keys >> shift) << shift
    return jnp.where(keys != INVALID_KEY, down, INVALID_KEY)


def downsample_coords(coords: jax.Array, stride_out: int) -> jax.Array:
    """Quantize coords down to ``stride_out``-aligned grid (no dedup).

    Mirrors /root/reference/utils.py:126-152 ``downsampled_coordinates``.
    Inputs are non-negative multiples of the current stride.
    """
    return (coords // stride_out) * stride_out


def conv_offsets(kernel_size: int, stride_units: int) -> jnp.ndarray:
    """Kernel offset table [K, 3] in coordinate units.

    kernel_size 3 -> offsets {-1, 0, 1} * stride_units (centered, like
    MinkowskiConvolution's odd-kernel region); kernel_size 2 -> {0, 1}
    (ME even-kernel convention, used by h_s upsampling,
    /root/reference/model/entropy_models.py:136).
    """
    if kernel_size == 3:
        r = (-1, 0, 1)
    elif kernel_size == 2:
        r = (0, 1)
    elif kernel_size == 1:
        r = (0,)
    else:
        raise ValueError(f"unsupported kernel_size {kernel_size}")
    offs = [
        (dx * stride_units, dy * stride_units, dz * stride_units)
        for dx in r
        for dy in r
        for dz in r
    ]
    return jnp.asarray(offs, dtype=jnp.int32)
