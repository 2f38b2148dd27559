"""Tiled-dense compute for generative upsampling.

The candidate set of a generative 2x upsample is the union of fully
dense 3^3 blocks around each parent (ops/sparse.expand_coords). Doing
per-candidate gather convs on it costs ~2G random HBM accesses per conv
— the measured bottleneck on TPU (~100M random gathers/s). This module
instead rasterizes the candidate neighborhood into dense T^3 tiles and
runs the convs as shifted dense einsums on the MXU:

    parents -> active tiles -> embed parent feats at their cells
    -> dense conv stack (halo via whole-tile row gathers from the 26
       neighbors) -> masked occupancy top-k -> compact + re-sort to the
       canonical sparse layout.

Memory layout: tile features are stored FLAT as [B, Nt, T^3 * C].
TPU tiling pads the minormost axis to 128 lanes; a [.., T,T,T, 64]
layout wastes 2x HBM (observed OOM at vox10 scale), while T^3*C is
always lane-aligned. The spatial form exists only inside per-chunk
transients of the conv.

Sparse-conv semantics are preserved exactly: unoccupied cells hold zero
features (a missing neighbor contributes nothing), bias is added once
at the output, outputs are masked to the candidate set.

Replaces the reference's MinkowskiGenerativeConvolutionTranspose +
conv/occupancy stack on candidate coordinates
(/root/reference/model/blocks.py:78-181) with an MXU-shaped program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from . import coords as C
from .sparse import SparseTensor

# Default cells per axis per tile. T=4 measures ~0.4-0.5 candidate fill
# on vox10 surfaces (T=8 only ~0.25). Grids carry their own tile size;
# T=2 (4x less cell padding on same-stride sets) measured SLOWER
# end-to-end on v5e — the stacks are gather/lookup-bound and those ops
# scale with tile count — so T=4 is the default everywhere
# (Capacities.stack_tile).
TILE = 4
CELLS = TILE**3
# Halo-transient budget per conv chunk. Chunks are iterations of a
# sequential lax.map: too small and the loop can't pipeline HBM against
# the MXU (vox10 candidate grids hit 180+ iterations at a fixed 2048);
# too big and the (size+2)^3 * Cin halo transient crowds 16GB HBM.
# 192MB compiled at vox10 until the live-chunk lax.cond wrapper added
# one more chunk-sized buffer to synth_c's plan (OOM by 191.6MB of
# 15.75G, measured 2026-08-19); 128MB clears it with chunks still ~2.4x
# the pipelining floor.
CONV_CHUNK_BYTES = 128 << 20
CONV_TILE_CHUNK = 2048  # floor


def _size_from_cells(cells: int) -> int:
    s = round(cells ** (1.0 / 3.0))
    assert s**3 == cells, cells
    return s


def _chunk_target(size: int, cin: int = 64) -> int:
    halo_bytes = (size + 2) ** 3 * cin * 2  # bf16
    return max(CONV_TILE_CHUNK, min(16384, CONV_CHUNK_BYTES // halo_bytes))


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=())
def _conv3d(h: jax.Array, w: jax.Array) -> jax.Array:
    """VALID 3D conv with f32 accumulation and a differentiable wrapper.

    ``preferred_element_type=f32`` keeps the pre-bias result exact, but
    its built-in vjp rejects the mixed (f32 cotangent, bf16 kernel)
    transpose it produces; the custom backward casts the cotangent to
    the operand dtype and differentiates the plain bf16 conv instead —
    gradients differ only by cotangent rounding (fine for training),
    while the forward stays bit-identical for the codec."""
    return jax.lax.conv_general_dilated(
        h, w, (1, 1, 1), "VALID",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        preferred_element_type=jnp.float32,
    )


def _conv3d_fwd(h, w):
    return _conv3d(h, w), (h, w)


def _conv3d_bwd(res, g):
    h, w = res

    def plain(h_, w_):
        return jax.lax.conv_general_dilated(
            h_, w_, (1, 1, 1), "VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )

    _, vjp = jax.vjp(plain, h, w)
    return vjp(g.astype(h.dtype))


_conv3d.defvjp(_conv3d_fwd, _conv3d_bwd)


def _pick_chunk(n_tiles: int, target: int = CONV_TILE_CHUNK) -> int:
    """Chunk size near ``target`` that divides n_tiles when possible —
    avoiding the jnp.pad of the whole tile array (a multi-GB copy for
    the channel-heavy packed representations)."""
    if n_tiles <= target:
        return n_tiles
    base = -(-n_tiles // target)
    for n_chunks in range(base, base + 24):
        if n_tiles % n_chunks == 0:
            return n_tiles // n_chunks
    return target


@struct.dataclass
class TileGrid:
    """Dense tile grid at a given cell stride (flat storage, see module
    docstring).

    keys:  [B, Nt] packed tile coordinates (sorted, INVALID padding).
    count: [B] valid tiles.
    mask:  [B, Nt, T^3] candidate-cell occupancy.
    stride: voxel stride of a cell.
    tile:  cells per axis (T) of this grid.
    """

    keys: jax.Array
    count: jax.Array
    mask: jax.Array
    stride: int = struct.field(pytree_node=False, default=1)
    tile: int = struct.field(pytree_node=False, default=TILE)
    # Per-axis coordinate bound of the underlying voxel space (see
    # SparseTensor.space_bits): shrinks spans/volumes at cube scale.
    space_bits: int = struct.field(pytree_node=False, default=C.COORD_BITS)

    @property
    def num_tiles(self) -> int:
        return self.keys.shape[1]

    @property
    def valid(self) -> jax.Array:
        return self.keys != C.INVALID_KEY


def _flat_local(local: jax.Array, size: int = TILE) -> jax.Array:
    return (local[..., 0] * size + local[..., 1]) * size + local[..., 2]


# -- Dense tile-rank volumes ------------------------------------------------
#
# Tile coordinate spaces are small ((COORD_RANGE / (stride * T))^3 <=
# 16.7M cells), so tile-set construction and coordinate->row lookup run
# as scatter + cumsum + O(1) volume gathers instead of O(N log^2 N)
# bitonic sorts / O(log N) per-query searchsorted — the measured decode
# bottlenecks on v5e (build_upsample_grid 2.6 s, candidate-grid
# neighbor_rows 1.4 s; the dense convs they feed are 0.17-0.27 s).
# The flat volume index IS the Morton packed key of the tile coords
# (spans are powers of two, so a tile's key < span^3), so emitted key
# lists are canonically sorted by construction and rank lookups gather
# straight at the key value.

# Largest volume the scatter/cumsum path is worth: 256^3 = 16.7M cells
# (67 MB int32 per vmap item — bounded HBM).
VOL_SPAN_MAX = 256
# Volume path must also beat sorting ~rows keys: skip it when the tile
# space dwarfs the row count (e.g. training-scale cubes). The sort
# alternative costs ~26 searchsorted sweeps of n_rows x log2(n_rows)
# poorly-coalesced steps (~470 x n_rows at vox10 tile counts; measured
# 1.4 s for 375k tiles on v5e vs ~0.1 s for the 16.7M-cell volume), so
# the crossover sits near span^3 ~ 100 x n_rows with a safety margin.
# Ratio 32 left the stride-1 candidate/post grids (span 256, ~230-375k
# tiles) on the sort path — the measured r3 decode hotspot.
VOL_ROWS_RATIO = 128


def grid_span(grid: TileGrid) -> int:
    """Tiles per axis of a grid's coordinate space."""
    return max(1, (1 << grid.space_bits) // (grid.stride * grid.tile))


def _use_volume(span: int, n_rows: int) -> bool:
    # span == 0 means "unknown" (callers without grid geometry): sort path.
    return 0 < span <= VOL_SPAN_MAX and span**3 <= VOL_ROWS_RATIO * n_rows


def _flat_tile(tc: jax.Array, span: int, ok: jax.Array) -> jax.Array:
    """[..., 3] tile coords -> flat volume index (= the Morton packed
    key; span is a power of two so valid keys < span^3); invalid ->
    span^3 (the sentinel row of rank volumes / the drop row of
    scatters)."""
    return jnp.where(ok, C.pack(tc), span**3)


def _vol_keys(flat_idx: jax.Array, span: int, capacity: int):
    """Sorted unique tile keys from candidate flat indices (one item).

    Returns (keys [capacity], rank_vol [span^3 + 1], count). rank_vol
    maps flat tile index -> grid row (capacity where unoccupied; the
    last entry is the miss sentinel), replacing searchsorted lookups.
    Overflow semantics match compact_keys: highest keys drop first.
    """
    vol = jnp.zeros((span**3,), bool).at[flat_idx].set(True, mode="drop")
    ranks = jnp.cumsum(vol.astype(jnp.int32)) - 1
    count = jnp.minimum(ranks[-1] + 1, capacity)
    dest = jnp.where(vol & (ranks < capacity), ranks, capacity)
    # Flat volume index == Morton packed key, so the enumeration IS the
    # key sequence (cumsum order == key order by construction).
    pk = jnp.arange(span**3, dtype=jnp.int32)
    keys = jnp.full((capacity,), C.INVALID_KEY, jnp.int32)
    keys = keys.at[dest].set(pk, mode="drop")
    rank_vol = jnp.concatenate([
        jnp.where(vol & (ranks < capacity), ranks, capacity),
        jnp.full((1,), capacity, jnp.int32),
    ])
    return keys, rank_vol, count


def _ranks_from_keys(keys: jax.Array, span: int, miss: int) -> jax.Array:
    """[span^3 + 1] int32 rank volume from a grid's sorted keys (one
    item): flat tile index -> row, ``miss`` where unoccupied. One
    scatter — no cumsum (rows already enumerate the sorted keys)."""
    ok = keys != C.INVALID_KEY
    # Valid tile keys ARE flat volume indices (Morton, < span^3);
    # invalid rows go OOB (dropped) — span^3 is the live miss sentinel.
    flat = jnp.where(ok, keys, span**3 + 1)
    n = keys.shape[0]
    vol = jnp.full((span**3 + 1,), miss, jnp.int32)
    return vol.at[flat].set(jnp.arange(n, dtype=jnp.int32), mode="drop")


# Parent cells per axis per tile: a tile spans TILE child cells
# = TILE // 2 parent cells (parents live on the even child grid), so the
# parent embedding shares the SAME tile keys / neighbor rows.
PTILE = TILE // 2
PCELLS = PTILE**3


def _flat_plocal(local: jax.Array) -> jax.Array:
    return (local[..., 0] * PTILE + local[..., 1]) * PTILE + local[..., 2]


def build_upsample_grid(
    parents: SparseTensor, tile_capacity: int
) -> Tuple[TileGrid, jax.Array]:
    """Activate tiles for a 2x generative upsample and embed parents.

    Returns (grid, parent_embedding [B, Nt, PTILE^3 * Cin]): grid.mask
    marks the 27 candidate children of every parent (clipped to the
    volume); the embedding holds each parent's features at its cell of
    the PARENT-resolution grid over the same tiles (embedding at child
    resolution would be ~97% zeros — 14GB at vox10 scale).
    """
    t = parents.stride // 2
    cell_span = max(1, (1 << parents.space_bits) // t)
    span = cell_span // TILE
    Cin = parents.num_channels
    B, N = parents.keys.shape

    pcell = parents.coords // t  # [B, N, 3] even cell coords
    pvalid = parents.valid

    lo = jnp.maximum(pcell - 1, 0) // TILE
    hi = jnp.minimum(pcell + 1, cell_span - 1) // TILE
    use_vol = _use_volume(span, N)

    def corner_coords(lo_i, hi_i):
        cands = []
        for sx in (0, 1):
            for sy in (0, 1):
                for sz in (0, 1):
                    cands.append(jnp.stack(
                        [
                            jnp.where(sx, hi_i[:, 0], lo_i[:, 0]),
                            jnp.where(sy, hi_i[:, 1], lo_i[:, 1]),
                            jnp.where(sz, hi_i[:, 2], lo_i[:, 2]),
                        ],
                        axis=-1,
                    ))
        return cands

    if use_vol:
        # One fused per-item pass over the rank volume: tile set, parent
        # embedding and candidate mask share the scatter+cumsum ranks.
        def item(lo_i, hi_i, pcell_i, feats_i, valid_i):
            cands = corner_coords(lo_i, hi_i)
            flat = _flat_tile(jnp.concatenate(cands), span,
                              jnp.tile(valid_i, 8))
            keys_i, rank_vol, count_i = _vol_keys(flat, span, tile_capacity)
            trow = rank_vol[_flat_tile(pcell_i // TILE, span, valid_i)]
            eflat = trow * PCELLS + _flat_plocal((pcell_i // 2) % PTILE)
            eflat = jnp.where(valid_i & (trow < tile_capacity), eflat,
                              tile_capacity * PCELLS)
            dense = jnp.zeros((tile_capacity * PCELLS, Cin), feats_i.dtype)
            emb_i = dense.at[eflat].set(feats_i, mode="drop")
            # Candidate mask: ONE scatter of all 27 dilation offsets (27
            # sequential .at[].set rounds serialize in XLA).
            offs = jnp.asarray(
                [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                 for dz in (-1, 0, 1)], jnp.int32)
            ch = pcell_i[None, :, :] + offs[:, None, :]      # [27, N, 3]
            ok = valid_i[None, :] & jnp.all(
                (ch >= 0) & (ch < cell_span), axis=-1)
            tr = rank_vol[_flat_tile(ch // TILE, span, ok)]
            mflat = tr * CELLS + _flat_local(ch % TILE)
            mflat = jnp.where(ok & (tr < tile_capacity), mflat,
                              tile_capacity * CELLS)
            mask_i = jnp.zeros((tile_capacity * CELLS,), bool).at[
                mflat.reshape(-1)].set(True, mode="drop")
            return keys_i, count_i, emb_i, mask_i

        tile_keys, tile_count, emb, mask = jax.vmap(item)(
            lo, hi, pcell, parents.feats, pvalid)
        grid = TileGrid(
            keys=tile_keys, count=tile_count,
            mask=mask.reshape(B, tile_capacity, CELLS), stride=t,
            space_bits=parents.space_bits)
        return grid, emb.reshape(B, tile_capacity, PCELLS * Cin)

    def tiles_item(lo_i, hi_i, valid_i):
        cands = corner_coords(lo_i, hi_i)
        keys = jnp.sort(jnp.concatenate(
            [C.pack_valid(s, valid_i) for s in cands]))
        keep = C.unique_mask_sorted(keys)
        out_keys, _, count = C.compact_keys(keys, keep, tile_capacity)
        return out_keys, count

    tile_keys, tile_count = jax.vmap(tiles_item)(lo, hi, pvalid)

    def embed(tile_keys_i, pcell_i, feats_i, valid_i):
        # Parent cell in parent-resolution units within its tile.
        pc2 = pcell_i // 2
        trow = C.lookup(tile_keys_i, C.pack_valid(pcell_i // TILE, valid_i))
        flat = trow * PCELLS + _flat_plocal(pc2 % PTILE)
        flat = jnp.where(valid_i & (trow < tile_capacity), flat, tile_capacity * PCELLS)
        dense = jnp.zeros((tile_capacity * PCELLS, Cin), feats_i.dtype)
        return dense.at[flat].set(feats_i, mode="drop")

    emb = jax.vmap(embed)(tile_keys, pcell, parents.feats, pvalid)
    emb = emb.reshape(B, tile_capacity, PCELLS * Cin)

    def mark(tile_keys_i, pcell_i, valid_i):
        dense = jnp.zeros((tile_capacity * CELLS,), bool)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    ch = pcell_i + jnp.array([dx, dy, dz], jnp.int32)
                    ok = valid_i & jnp.all((ch >= 0) & (ch < cell_span), axis=-1)
                    trow = C.lookup(tile_keys_i, C.pack_valid(ch // TILE, ok))
                    flat = trow * CELLS + _flat_local(ch % TILE)
                    flat = jnp.where(ok & (trow < tile_capacity), flat,
                                     tile_capacity * CELLS)
                    dense = dense.at[flat].set(True, mode="drop")
        return dense

    mask = jax.vmap(mark)(tile_keys, pcell, pvalid)
    mask = mask.reshape(B, tile_capacity, CELLS)

    grid = TileGrid(keys=tile_keys, count=tile_count, mask=mask, stride=t,
                    space_bits=parents.space_bits)
    return grid, emb


def rasterize(
    st: SparseTensor, tile_capacity: int, tile: int = TILE
) -> Tuple[TileGrid, jax.Array]:
    """Rasterize a sparse tensor into dense tiles at its own stride.

    Returns (grid with occupancy mask, feats [B, Nt, T^3 * C]). Used to
    run same-coordinate conv stacks (FiLM blocks, Q heads, post-convs)
    as dense einsums instead of per-row gathers. ``tile`` picks the cell
    resolution: T=2 for sparse same-stride sets (4x less cell padding
    than T=4 on vox10 surfaces), T=4 for denser candidate sets.
    """
    Cdim = st.num_channels
    B, N = st.keys.shape
    cells = tile**3
    span = max(1, (1 << st.space_bits) // (st.stride * tile))
    cell = st.coords // st.stride
    valid = st.valid

    if _use_volume(span, N):
        def item(cell_i, feats_i, valid_i):
            tflat = _flat_tile(cell_i // tile, span, valid_i)
            keys_i, rank_vol, count_i = _vol_keys(tflat, span, tile_capacity)
            trow = rank_vol[tflat]
            flat = trow * cells + _flat_local(cell_i % tile, tile)
            flat = jnp.where(valid_i & (trow < tile_capacity), flat,
                             tile_capacity * cells)
            dense = jnp.zeros((tile_capacity * cells, Cdim), feats_i.dtype)
            dense = dense.at[flat].set(feats_i, mode="drop")
            occ = jnp.zeros((tile_capacity * cells,), bool).at[flat].set(
                True, mode="drop")
            return keys_i, count_i, dense, occ

        tile_keys, tile_count, feats, occ = jax.vmap(item)(cell, st.feats, valid)
        grid = TileGrid(
            keys=tile_keys,
            count=tile_count,
            mask=occ.reshape(B, tile_capacity, cells),
            stride=st.stride,
            tile=tile,
            space_bits=st.space_bits,
        )
        return grid, feats.reshape(B, tile_capacity, cells * Cdim)

    def tiles_item(cell_i, valid_i):
        keys = jnp.sort(C.pack_valid(cell_i // tile, valid_i))
        keep = C.unique_mask_sorted(keys)
        out_keys, _, count = C.compact_keys(keys, keep, tile_capacity)
        return out_keys, count

    tile_keys, tile_count = jax.vmap(tiles_item)(cell, valid)

    def scatter(tile_keys_i, cell_i, feats_i, valid_i):
        trow = C.lookup(tile_keys_i, C.pack_valid(cell_i // tile, valid_i))
        flat = trow * cells + _flat_local(cell_i % tile, tile)
        flat = jnp.where(valid_i & (trow < tile_capacity), flat, tile_capacity * cells)
        dense = jnp.zeros((tile_capacity * cells, Cdim), feats_i.dtype)
        dense = dense.at[flat].set(feats_i, mode="drop")
        occ = jnp.zeros((tile_capacity * cells,), bool).at[flat].set(True, mode="drop")
        return dense, occ

    feats, occ = jax.vmap(scatter)(tile_keys, cell, st.feats, valid)
    grid = TileGrid(
        keys=tile_keys,
        count=tile_count,
        mask=occ.reshape(B, tile_capacity, cells),
        stride=st.stride,
        tile=tile,
        space_bits=st.space_bits,
    )
    return grid, feats.reshape(B, tile_capacity, cells * Cdim)


def row_positions(grid: TileGrid, st: SparseTensor) -> jax.Array:
    """[B, N] flat cell index (into [Nt * T^3]) of each row of ``st``
    on ``grid`` (misses / padding rows -> Nt * T^3, the zero row).

    st's coordinate set must lie inside the grid's cells. When a conv
    stack PRESERVES the coordinate set, pulling rows back out of the
    grid is a pure gather at these positions (st's canonical row order
    is kept by construction) — no cumsum-compact + argsort extraction
    (extract_sparse) needed. One rank-volume scatter per item.
    """
    B, Nt = grid.keys.shape
    tile = grid.tile
    cells = tile**3
    span = grid_span(grid)
    use_vol = _use_volume(span, Nt)
    cell = st.coords // st.stride
    valid = st.valid

    def item(tile_keys_i, cell_i, valid_i):
        if use_vol:
            rank_vol = _ranks_from_keys(tile_keys_i, span, Nt)
            trow = rank_vol[_flat_tile(cell_i // tile, span, valid_i)]
        else:
            trow = C.lookup(tile_keys_i, C.pack_valid(cell_i // tile, valid_i))
        flat = trow * cells + _flat_local(cell_i % tile, tile)
        return jnp.where(valid_i & (trow < Nt), flat, Nt * cells)

    return jax.vmap(item)(grid.keys, cell, valid)


def gather_rows(
    grid: TileGrid, feats: jax.Array, positions: jax.Array,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Gather per-row features out of grid storage at precomputed
    :func:`row_positions`. feats [B, Nt, T^3 * C]; positions [B, N].
    Returns [B, N, C] (zero rows at miss positions)."""
    B, Nt = grid.keys.shape
    cells = grid.tile**3
    Cdim = feats.shape[-1] // cells
    flat = feats.reshape(B, Nt * cells, Cdim)
    # Miss positions index one past the end; fill-mode gather avoids
    # concatenating a zero row (a full copy of the grid tensor).
    out = jnp.take_along_axis(
        flat, positions[..., None], axis=1, mode="fill", fill_value=0
    )
    return out.astype(out_dtype)


def scatter_feats(
    grid: TileGrid, st: SparseTensor, dtype=None,
    positions: Optional[jax.Array] = None,
) -> jax.Array:
    """Scatter row features onto an existing grid (st's coordinate set
    must be the grid's occupied cells). Returns [B, Nt, T^3 * C].
    ``positions`` (from :func:`row_positions`) skips the per-call rank
    lookup when the caller scatters/gathers the same set repeatedly."""
    Cdim = st.num_channels
    B, Nt = grid.keys.shape
    cells = grid.tile**3
    feats = st.feats if dtype is None else st.feats.astype(dtype)
    if positions is None:
        positions = row_positions(grid, st)

    def scatter(flat, feats_i):
        dense = jnp.zeros((Nt * cells, Cdim), feats_i.dtype)
        return dense.at[flat].set(feats_i, mode="drop")

    out = jax.vmap(scatter)(positions, feats)
    return out.reshape(B, Nt, cells * Cdim)


_DIRS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if (dx, dy, dz) != (0, 0, 0)
]


def neighbor_rows(grid_keys: jax.Array, span: int = 0) -> jax.Array:
    """[B, 26, Nt] neighbor tile row indices (Nt = miss).

    With ``span`` (= grid_span(grid)) the lookups run as O(1) gathers
    from a dense rank volume (one scatter) instead of 26 searchsorted
    sweeps — 26 x Nt binary searches measured 0.9-1.4 s at vox10 tile
    counts."""
    B, Nt = grid_keys.shape
    coords = C.unpack(grid_keys)
    valid = grid_keys != C.INVALID_KEY

    if _use_volume(span, Nt):
        def per_item_vol(keys_i, coords_i, valid_i):
            rank_vol = _ranks_from_keys(keys_i, span, Nt)
            rows = []
            for d in _DIRS:
                q = coords_i + jnp.asarray(d, jnp.int32)
                ok = valid_i & jnp.all((q >= 0) & (q < span), axis=-1)
                rows.append(rank_vol[_flat_tile(q, span, ok)])
            return jnp.stack(rows)

        return jax.vmap(per_item_vol)(grid_keys, coords, valid)

    def per_item(keys_i, coords_i, valid_i):
        rows = []
        for d in _DIRS:
            q = coords_i + jnp.asarray(d, jnp.int32)
            rows.append(C.lookup(keys_i, C.pack_valid(q, valid_i)))
        return jnp.stack(rows)

    return jax.vmap(per_item)(grid_keys, coords, valid)


def _slab_slice(d: int, size: int = TILE) -> slice:
    # Source slice in the NEIGHBOR tile for halo direction d: neighbor at
    # +1 contributes its lowest plane, at -1 its highest.
    if d == -1:
        return slice(size - 1, size)
    if d == 1:
        return slice(0, 1)
    return slice(0, size)


def _slab_shape(d, size: int):
    return tuple((1 if dv != 0 else size) for dv in d)


def _extract_slabs(xp, size: int, cin: int):
    """Pre-slice the 6 FACE slabs of every tile ONCE.

    xp: [B, Ntp, size^3 * Cin] flat tiles. Returns {(axis, sign):
    [B, Ntp+1, size^2 * Cin]} — the face plane a neighbor in direction
    sign along ``axis`` hands over (its opposite face, _slab_slice).
    Row Ntp is a zero miss row, so halo gathers are a plain take with no
    post-masking. Per-direction takes deliberately stay SEPARATE: one
    fused take over a stacked slab array measured SLOWER end-to-end on
    v5e (synth_b 2.08 -> 2.63 s) — XLA pipelines the 26 streams better
    than one giant irregular gather.

    Edge/corner slabs are sub-slices of a face slab, so the halo build
    gathers face rows (size^2 cells) for all 26 directions and slices
    after the gather: total gather traffic is 26 * size^2 cells/tile
    instead of 26 * size^3 (4x less; the whole-tile formulation measured
    1.1 s of the 2.5 s dense conv on v5e), and resident slab memory is
    1.5x the tile array instead of 2.375x — the difference between
    fitting vox10 HBM and OOM."""
    B, Ntp, _ = xp.shape
    xs = xp.reshape(B, Ntp, size, size, size, cin)
    full = slice(0, size)
    slabs = {}
    for axis in range(3):
        for sign in (-1, 1):
            sl3 = [full, full, full]
            sl3[axis] = _slab_slice(sign, size)
            sl = xs[:, :, sl3[0], sl3[1], sl3[2]].reshape(B, Ntp, -1)
            slabs[(axis, sign)] = jnp.concatenate(
                [sl, jnp.zeros_like(sl[:, :1])], axis=1
            )
    return slabs


def _face_axis(d) -> int:
    """Priority axis whose face array serves direction d."""
    for a in range(3):
        if d[a] != 0:
            return a
    raise ValueError(d)


def _build_halo_slabs(xp, slabs, nbrp, start, chunk, size, cin, B, Nt, pad_tiles):
    """Assemble a haloed [B, chunk, size+2, size+2, size+2, Cin] block
    from flat tile storage + pre-extracted face slabs.

    The halo decomposes into a 3x3x3 block structure (core + 26 neighbor
    slabs) assembled with hierarchical concatenates so the buffer is
    written ONCE (26 sequential ``.at[]`` pastes re-materialize the
    whole halo per paste under XLA copy-on-write — measured ~95% of
    dense-conv runtime)."""
    fc = size**3 * cin
    core = jax.lax.dynamic_slice(xp, (0, start, 0), (B, chunk, fc))
    core = core.reshape(B, chunk, size, size, size, cin)
    nbr_chunk = jax.lax.dynamic_slice(nbrp, (0, 0, start), (B, 26, chunk))
    miss = Nt + pad_tiles
    full = slice(0, size)
    piece = {(0, 0, 0): core}
    for di, d in enumerate(_DIRS):
        rows = nbr_chunk[:, di]
        rows = jnp.where(rows < Nt, rows, miss)
        a = _face_axis(d)
        g = jax.vmap(lambda arr, r: jnp.take(arr, r, axis=0))(slabs[(a, d[a])], rows)
        # Face plane -> [B, chunk, sx, sy, sz, cin] with size 1 on axis a,
        # then slice the remaining axes down to the slab for d.
        fshape = [size, size, size]
        fshape[a] = 1
        g = g.reshape((B, chunk) + tuple(fshape) + (cin,))
        sl3 = [full, full, full]
        for ax in range(3):
            if ax != a:
                sl3[ax] = _slab_slice(d[ax], size)
        piece[d] = g[:, :, sl3[0], sl3[1], sl3[2]]
    planes_x = []
    for dx in (-1, 0, 1):
        planes_y = []
        for dy in (-1, 0, 1):
            planes_y.append(
                jnp.concatenate([piece[(dx, dy, dz)] for dz in (-1, 0, 1)], axis=4)
            )
        planes_x.append(jnp.concatenate(planes_y, axis=3))
    return jnp.concatenate(planes_x, axis=2)


def _build_halo(xp, nbrp, start, chunk, size, cin, B, Nt, pad_tiles):
    """Whole-tile-gather halo (kept for micro-bench comparison; the conv
    entry points use _build_halo_slabs)."""
    fc = size**3 * cin

    def take_tiles(rows):
        safe = jnp.minimum(rows, Nt + pad_tiles - 1)
        g = jax.vmap(lambda a, r: jnp.take(a, r, axis=0))(xp, safe)
        return g * (rows < Nt)[..., None].astype(g.dtype)

    core = jax.lax.dynamic_slice(xp, (0, start, 0), (B, chunk, fc))
    core = core.reshape(B, chunk, size, size, size, cin)
    nbr_chunk = jax.lax.dynamic_slice(nbrp, (0, 0, start), (B, 26, chunk))
    piece = {(0, 0, 0): core}
    for di, d in enumerate(_DIRS):
        tilesd = take_tiles(nbr_chunk[:, di]).reshape(B, chunk, size, size, size, cin)
        piece[d] = tilesd[:, :, _slab_slice(d[0], size), _slab_slice(d[1], size),
                          _slab_slice(d[2], size)]
    planes_x = []
    for dx in (-1, 0, 1):
        planes_y = []
        for dy in (-1, 0, 1):
            planes_y.append(
                jnp.concatenate([piece[(dx, dy, dz)] for dz in (-1, 0, 1)], axis=4)
            )
        planes_x.append(jnp.concatenate(planes_y, axis=3))
    return jnp.concatenate(planes_x, axis=2)


# Pallas fused-kernel dispatch: RETIRED (round 5). The fused tile-conv
# kernels (rounds 2-3; commits 0c5626a, b0337b0, 5c69141) measured
# 3.3 / 10.8 TF/s END-TO-END at C=64/128 vs 11.2 / 20.1 TF/s for the
# XLA conv_general_dilated core on identical stages, despite a
# kernel-alone upper bound of 25+ TF/s (scripts history:
# exp_pallas_breakdown): the neighbor-slab gather XLA must materialize
# AROUND the kernel dominated and the fusion saved less than the
# gather cost. Closing decision per VERDICT r4 #4: XLA wins; the
# LCPCGA_PALLAS flag and kernel library were deleted. A future win
# would need the gather INSIDE the kernel (scalar-prefetched per-tile
# DMA pipelines from an HBM row table), which trades ~6.5M small DMAs
# per stage against a working 20 TF/s core — not attempted.


# Trace-time flag: decode-only programs (codec_runtime's synthesis /
# analysis stage jits) activate this to get the dynamic-trip while_loop
# chunk runner — forward-only (while_loop is not reverse-differentiable)
# but with NO lax.cond branch buffer and true skipping of dead chunks.
# Training traces (value_and_grad) leave it off and get the
# reverse-differentiable lax.cond form.
_FORWARD_ONLY = [False]


class forward_only:
    """Context manager marking traces as never-differentiated."""

    def __enter__(self):
        self._prev = _FORWARD_ONLY[0]
        _FORWARD_ONLY[0] = True

    def __exit__(self, *exc):
        _FORWARD_ONLY[0] = self._prev
        return False


def _chunk_runner(do_chunk, n_chunks: int, chunk: int, out_cells: int,
                  dtype, B: int, live: Optional[jax.Array]):
    """Run ``do_chunk`` over all chunks, skipping chunks past the live
    tile count.

    Grids store valid tiles FIRST, and padding-tile outputs are
    mask-zeroed, so any chunk whose tiles all lie past max(live) can
    return zeros without running the halo gathers / matmuls — capacity
    profiles carry 1.1-1.6x margin, which is pure padding FLOPs
    otherwise. Inside :class:`forward_only` traces the skip is a
    dynamic-trip ``while_loop`` writing into one preallocated output
    (no extra buffers); elsewhere ``lax.cond`` keeps the op
    reverse-differentiable for the training step."""
    ck = jax.checkpoint(do_chunk)
    if live is None:
        chunks = jax.lax.map(ck, jnp.arange(n_chunks))
        return jnp.moveaxis(chunks, 0, 1).reshape(
            B, n_chunks * chunk, out_cells)
    n_live = jnp.minimum((jnp.max(live) + chunk - 1) // chunk, n_chunks)
    if _FORWARD_ONLY[0]:
        out0 = jnp.zeros((B, n_chunks * chunk, out_cells), dtype)

        def body(carry):
            ci, out = carry
            res = do_chunk(ci).astype(dtype)
            out = jax.lax.dynamic_update_slice(out, res, (0, ci * chunk, 0))
            return ci + 1, out

        _, out = jax.lax.while_loop(
            lambda c: c[0] < n_live, body,
            (jnp.int32(0), out0))
        return out

    def body(ci):
        return jax.lax.cond(
            ci < n_live, ck,
            lambda _: jnp.zeros((B, chunk, out_cells), dtype), ci)

    chunks = jax.lax.map(body, jnp.arange(n_chunks))
    return jnp.moveaxis(chunks, 0, 1).reshape(B, n_chunks * chunk, out_cells)


def transpose_dense_conv(
    pfeats: jax.Array,
    nbr_rows: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    compute_dtype=jnp.bfloat16,
    mask: Optional[jax.Array] = None,
    live: Optional[jax.Array] = None,
) -> jax.Array:
    """Generative transposed conv: parent-resolution grid -> child grid.

    pfeats: [B, Nt, PTILE^3 * Cin] (parents on the even child grid);
    kernel: [27, Cin, Cout], tap k multiplies in[o - off_k]
    (off = ops.coords.conv_offsets order — the transpose convention of
    ops/sparse.transpose_map). Each tap routes to a fixed child-parity
    slot with a fixed parent shift, so the op is 27 dense einsums over
    the haloed parent block. Returns child grid [B, Nt, TILE^3 * Cout].
    """
    B, Nt, FC = pfeats.shape
    Cin = kernel.shape[1]
    Cout = kernel.shape[-1]
    assert FC % Cin == 0, (FC, Cin)
    psize = _size_from_cells(FC // Cin)
    pcells = psize**3
    csize = 2 * psize
    ccells = csize**3
    kern = kernel.astype(compute_dtype)

    x = pfeats.astype(compute_dtype)
    chunk = _pick_chunk(Nt, _chunk_target(psize, Cin))
    n_chunks = -(-Nt // chunk)
    pad_tiles = n_chunks * chunk - Nt
    xp = jnp.pad(x, ((0, 0), (0, pad_tiles), (0, 0)))
    nbrp = jnp.pad(nbr_rows, ((0, 0), (0, 0), (0, pad_tiles)), constant_values=Nt)
    maskp = None
    if mask is not None:
        maskp = jnp.pad(mask, ((0, 0), (0, pad_tiles), (0, 0)))

    # Unified subpixel weight: every (parent-window w, child-parity p)
    # pair maps to kernel tap o = p - 2w per axis (or a zero row when
    # |o| > 1). One [chunk*8, 8*Cin] @ [8*Cin, 8*Cout] matmul replaces
    # 27 small einsums + 27 copy-on-write parity scatter-adds; the ~2.4x
    # padded FLOPs are far cheaper than the serialization they replace.
    import numpy as _np

    idx = _np.full((2, 2, 2, 2, 2, 2), 27, _np.int32)  # 27 = zero tap
    for wx in range(2):
        for wy in range(2):
            for wz in range(2):
                for px in range(2):
                    for py in range(2):
                        for pz in range(2):
                            o = (px - 2 * wx, py - 2 * wy, pz - 2 * wz)
                            if all(-1 <= v <= 1 for v in o):
                                idx[wx, wy, wz, px, py, pz] = (
                                    (o[0] + 1) * 9 + (o[1] + 1) * 3 + (o[2] + 1)
                                )
    kern_ext = jnp.concatenate(
        [kern, jnp.zeros((1,) + kern.shape[1:], kern.dtype)], axis=0
    )
    # [8(w), 8(p), Cin, Cout] -> [8(w), Cin, 8(p), Cout] -> [8Cin, 8Cout]
    w_sub = kern_ext[jnp.asarray(idx.reshape(8, 8))]
    w_sub = w_sub.transpose(0, 2, 1, 3).reshape(8 * Cin, 8 * Cout)

    slabs = _extract_slabs(xp, psize, Cin)

    def do_chunk(ci):
        start = ci * chunk
        halo = _build_halo_slabs(xp, slabs, nbrp, start, chunk, psize, Cin, B,
                                 Nt, pad_tiles)
        h = halo.reshape(B * chunk, psize + 2, psize + 2, psize + 2, Cin)
        cols = []
        for wx in range(2):
            for wy in range(2):
                for wz in range(2):
                    cols.append(
                        h[:, 1 + wx:1 + wx + psize, 1 + wy:1 + wy + psize,
                          1 + wz:1 + wz + psize]
                    )
        col = jnp.stack(cols, axis=4).reshape(B * chunk * pcells, 8 * Cin)
        child = jnp.dot(col, w_sub, preferred_element_type=jnp.float32)
        # [N, ux,uy,uz, px,py,pz, Cout] -> interleave to child cells.
        child = child.reshape(
            B * chunk, psize, psize, psize, 2, 2, 2, Cout)
        child = child.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        out = child.reshape(B, chunk, ccells, Cout)
        if bias is not None:
            out = out + bias
        if maskp is not None:
            m = jax.lax.dynamic_slice(maskp, (0, start, 0), (B, chunk, ccells))
            out = out * m.astype(out.dtype)[..., None]
        return out.astype(pfeats.dtype).reshape(B, chunk, ccells * Cout)

    return _chunk_runner(do_chunk, n_chunks, chunk, ccells * Cout,
                         pfeats.dtype, B, live)[:, :Nt]


def dense_conv(
    feats: jax.Array,
    nbr_rows: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    flip: bool = False,
    compute_dtype=jnp.bfloat16,
    mask: Optional[jax.Array] = None,
    relu: bool = False,
    live: Optional[jax.Array] = None,
) -> jax.Array:
    """3^3 dense conv across tiles with halo exchange.

    feats: [B, Nt, T^3 * Cin] flat; nbr_rows: [B, 26, Nt];
    kernel: [27, Cin, Cout] (tap order = ops.coords.conv_offsets(3, .));
    flip reverses taps (transposed-conv weight convention).
    Returns [B, Nt, T^3 * Cout] flat (unmasked; caller applies masks).
    Chunked over tiles; core rows are contiguous dynamic slices, halo
    slabs come from whole-tile row gathers of the 26 neighbors.
    """
    B, Nt, FC = feats.shape
    Cin = kernel.shape[1]
    Cout = kernel.shape[-1]
    assert FC % Cin == 0, (FC, Cin)
    size = _size_from_cells(FC // Cin)
    cells = size**3
    kern = (kernel[::-1] if flip else kernel).astype(compute_dtype)

    x = feats.astype(compute_dtype)

    chunk = _pick_chunk(Nt, _chunk_target(size, Cin))
    n_chunks = -(-Nt // chunk)
    pad_tiles = n_chunks * chunk - Nt
    xp = jnp.pad(x, ((0, 0), (0, pad_tiles), (0, 0)))
    # Neighbor rows, padded tail rows point at the miss row Nt.
    nbrp = jnp.pad(nbr_rows, ((0, 0), (0, 0), (0, pad_tiles)), constant_values=Nt)

    maskp = None
    if mask is not None:
        maskp = jnp.pad(mask, ((0, 0), (0, pad_tiles), (0, 0)))

    # Single 3D conv on the haloed block: XLA's conv_general_dilated is
    # the fastest core measured on v5e (11.2/20.1 TF/s at C=64/128 vs
    # 7.3/12.6 for z-unrolled sliced einsums and 3.3/10.8 for the Pallas
    # kernels — scripts/exp_conv_cores.py, corrected timing protocol).
    w3 = kern.reshape(3, 3, 3, Cin, Cout)

    slabs = _extract_slabs(xp, size, Cin)

    def do_chunk(ci):
        start = ci * chunk
        halo = _build_halo_slabs(xp, slabs, nbrp, start, chunk, size, Cin, B,
                                 Nt, pad_tiles)
        h = halo.reshape(B * chunk, size + 2, size + 2, size + 2, Cin)
        acc = _conv3d(h, w3)
        out = acc.reshape(B, chunk, cells, Cout)
        if bias is not None:
            out = out + bias
        if maskp is not None:
            m = jax.lax.dynamic_slice(maskp, (0, start, 0), (B, chunk, cells))
            out = out * m.astype(out.dtype)[..., None]
        if relu:
            out = jnp.maximum(out, 0)
        return out.astype(feats.dtype).reshape(B, chunk, cells * Cout)

    return _chunk_runner(do_chunk, n_chunks, chunk, cells * Cout,
                         feats.dtype, B, live)[:, :Nt]


def downsample_pack(
    grid: TileGrid, feats: jax.Array, tile_capacity: int
) -> Tuple[TileGrid, jax.Array]:
    """Space-to-depth pack: stride-s tile grid -> stride-2s tile grid
    with the 2^3 cell parities folded into channels.

    feats: [B, Nt, T^3 * C] -> packed [B, Nt2, T^3 * 8C] where packed
    cell c (stride 2s) holds the 8 stride-s cells 2c+q, q-major layout
    [qx, qy, qz, C]. Occupancy mask of the new grid marks coarse cells
    with >= 1 occupied fine cell — exactly the stride-2 downsampled
    coordinate set, so a 3^3/stride-2 sparse conv becomes a 2^3-support
    dense conv on the packed grid (pack_stride2_kernel) with no gather.

    Replaces the gather-based strided convs of the analysis transform
    (/root/reference/model/transforms.py:49-51 downsampling stages).
    T=2 grids take the cheaper whole-tile-row path (downsample_pack_t2).
    """
    if grid.tile == 2:
        return downsample_pack_t2(grid, feats, tile_capacity)
    assert grid.tile == TILE, "downsample_pack requires T=2 or T=4 grids"
    Cdim = feats.shape[-1] // CELLS
    B, Nt = grid.keys.shape
    span_in = grid_span(grid)
    use_vol = _use_volume(span_in, Nt)
    tile_coords = C.unpack(grid.keys)
    valid = grid.valid

    if use_vol:
        def tiles_item(tc_i, valid_i):
            flat = _flat_tile(tc_i // 2, span_in // 2, valid_i)
            k_, _, c_ = _vol_keys(flat, span_in // 2, tile_capacity)
            return k_, c_
    else:
        def tiles_item(tc_i, valid_i):
            keys = jnp.sort(C.pack_valid(tc_i // 2, valid_i))
            keep = C.unique_mask_sorted(keys)
            out_keys, _, count = C.compact_keys(keys, keep, tile_capacity)
            return out_keys, count

    keys2, count2 = jax.vmap(tiles_item)(tile_coords, valid)

    # Old tile [4,4,4,C] -> [2,2,2 coarse, 8C] (q-major channel blocks).
    f = feats.reshape(B, Nt, 2, 2, 2, 2, 2, 2, Cdim)  # cx qx cy qy cz qz
    f = f.transpose(0, 1, 2, 4, 6, 3, 5, 7, 8).reshape(B, Nt, 8, 8 * Cdim)
    m = grid.mask.reshape(B, Nt, 2, 2, 2, 2, 2, 2)
    m = m.transpose(0, 1, 2, 4, 6, 3, 5, 7).reshape(B, Nt, 8, 8).any(-1)

    # Each new tile gathers its 8 constituent old tiles (quadrants).
    # Chunked over output tiles: the assembled packed array is ~2-5GB at
    # vox10 scale and the stack+interleave transients would double it.
    CHUNK = min(8192, tile_capacity)
    n_chunks = -(-tile_capacity // CHUNK)
    pad2 = n_chunks * CHUNK - tile_capacity
    keys2p = jnp.pad(keys2, ((0, 0), (0, pad2)), constant_values=C.INVALID_KEY)

    def assemble(keys2_i, old_keys_i, f_i, m_i):
        n_old = f_i.shape[0]

        def chunk(kc):  # [CHUNK] packed tile keys
            tc2 = C.unpack(kc)
            v2 = kc != C.INVALID_KEY
            quads_f = []
            quads_m = []
            for bx in (0, 1):
                for by in (0, 1):
                    for bz in (0, 1):
                        q = tc2 * 2 + jnp.asarray([bx, by, bz], jnp.int32)
                        rows = C.lookup(old_keys_i, C.pack_valid(q, v2))
                        hit = (rows < n_old)
                        safe = jnp.minimum(rows, n_old - 1)
                        gf = f_i[safe] * hit[:, None, None].astype(f_i.dtype)
                        gm = m_i[safe] & hit[:, None]
                        quads_f.append(gf)  # [CHUNK, 8, 8C]
                        quads_m.append(gm)  # [CHUNK, 8]
            qf = jnp.stack(quads_f, axis=1).reshape(
                CHUNK, 2, 2, 2, 2, 2, 2, 8 * Cdim)
            qf = qf.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
                CHUNK, CELLS * 8 * Cdim)
            qm = jnp.stack(quads_m, axis=1).reshape(
                CHUNK, 2, 2, 2, 2, 2, 2)
            qm = qm.transpose(0, 1, 4, 2, 5, 3, 6).reshape(CHUNK, CELLS)
            return qf, qm

        qf, qm = jax.lax.map(jax.checkpoint(chunk), keys2_i.reshape(n_chunks, CHUNK))
        return (qf.reshape(n_chunks * CHUNK, -1)[:tile_capacity],
                qm.reshape(n_chunks * CHUNK, -1)[:tile_capacity])

    pf, pm = jax.vmap(assemble)(keys2p, grid.keys, f, m)
    grid2 = TileGrid(keys=keys2, count=count2, mask=pm, stride=grid.stride * 2,
                     space_bits=grid.space_bits)
    return grid2, pf


def downsample_pack_t2(
    grid: TileGrid, feats: jax.Array, tile_capacity: int
) -> Tuple[TileGrid, jax.Array]:
    """Space-to-depth pack on T=2 grids: stride-s T=2 tiles -> stride-2s
    T=2 tiles with the 2^3 cell parities folded into channels.

    A T=2 tile at stride s spans exactly one stride-2s cell, so each
    output CELL is one whole input TILE: the pack is a single
    8-quadrant row gather per output tile with NO intra-row
    transposes (the input tile's q-major [2^3, C] flat layout IS the
    packed cell's q-major channel block). This is the T=2 analogue of
    ``downsample_pack`` and feeds the same ``pack_stride2_kernel`` /
    ``dense_conv2`` convs; T=2 grids keep the whole analysis pyramid at
    ~19-32% cell fill on vox10 surfaces vs 5-15% for T=4
    (/root/reference/model/transforms.py:49-51 downsampling stages).
    """
    assert grid.tile == 2, "downsample_pack_t2 requires T=2 grids"
    B, Nt = grid.keys.shape
    Crow = feats.shape[-1]  # 8 * C (one input tile row)
    span_in = grid_span(grid)
    use_vol = _use_volume(span_in, Nt)
    tile_coords = C.unpack(grid.keys)
    valid = grid.valid

    if use_vol:
        def tiles_item(tc_i, valid_i):
            flat = _flat_tile(tc_i // 2, span_in // 2, valid_i)
            k_, _, c_ = _vol_keys(flat, span_in // 2, tile_capacity)
            return k_, c_
    else:
        def tiles_item(tc_i, valid_i):
            keys = jnp.sort(C.pack_valid(tc_i // 2, valid_i))
            keep = C.unique_mask_sorted(keys)
            out_keys, _, count = C.compact_keys(keys, keep, tile_capacity)
            return out_keys, count

    keys2, count2 = jax.vmap(tiles_item)(tile_coords, valid)

    CHUNK = min(16384, tile_capacity)
    n_chunks = -(-tile_capacity // CHUNK)
    pad2 = n_chunks * CHUNK - tile_capacity
    keys2p = jnp.pad(keys2, ((0, 0), (0, pad2)), constant_values=C.INVALID_KEY)

    def assemble(keys2_i, old_keys_i, f_i, m_i):
        n_old = f_i.shape[0]
        rank_vol = (_ranks_from_keys(old_keys_i, span_in, n_old)
                    if use_vol else None)

        def chunk(kc):  # [CHUNK] packed output tile keys
            tc2 = C.unpack(kc)
            v2 = kc != C.INVALID_KEY
            quads_f = []
            quads_m = []
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        t = tc2 * 2 + jnp.asarray([dx, dy, dz], jnp.int32)
                        if use_vol:
                            rows = rank_vol[_flat_tile(t, span_in, v2)]
                        else:
                            rows = C.lookup(old_keys_i, C.pack_valid(t, v2))
                        hit = rows < n_old
                        safe = jnp.minimum(rows, n_old - 1)
                        gf = f_i[safe] * hit[:, None].astype(f_i.dtype)
                        gm = jnp.any(m_i[safe], axis=-1) & hit
                        quads_f.append(gf)   # [CHUNK, 8C]
                        quads_m.append(gm)   # [CHUNK]
            # Output-cell-major: cell (dx,dy,dz) = _flat_local order.
            qf = jnp.stack(quads_f, axis=1).reshape(CHUNK, 8 * Crow)
            qm = jnp.stack(quads_m, axis=1)  # [CHUNK, 8]
            return qf, qm

        qf, qm = jax.lax.map(jax.checkpoint(chunk), keys2_i.reshape(n_chunks, CHUNK))
        return (qf.reshape(n_chunks * CHUNK, -1)[:tile_capacity],
                qm.reshape(n_chunks * CHUNK, -1)[:tile_capacity])

    pf, pm = jax.vmap(assemble)(keys2p, grid.keys, feats, grid.mask)
    grid2 = TileGrid(keys=keys2, count=count2, mask=pm, stride=grid.stride * 2,
                     tile=2, space_bits=grid.space_bits)
    return grid2, pf


def pack_stride2_kernel(kernel: jax.Array) -> jax.Array:
    """[27, Cin, Cout] 3^3/stride-2 conv weights -> [8, 8*Cin, Cout]
    2^3-support weights on the packed grid.

    Per axis: packed-cell offset s in {-1, 0}, parity q in {0, 1} map to
    the original tap o = 2s + q; (s=-1, q=0) -> o=-2 contributes zero.
    Tap order matches dense_conv2 (s lexicographic, -1 first); channel
    blocks are q-major (downsample_pack layout)."""
    Cin, Cout = kernel.shape[1], kernel.shape[2]
    w = jnp.zeros((8, 8 * Cin, Cout), kernel.dtype)
    for i, sx in enumerate((-1, 0)):
        for j, sy in enumerate((-1, 0)):
            for k_, sz in enumerate((-1, 0)):
                ti = (i * 2 + j) * 2 + k_
                for qi, qx in enumerate((0, 1)):
                    for qj, qy in enumerate((0, 1)):
                        for qk, qz in enumerate((0, 1)):
                            o = (2 * sx + qx, 2 * sy + qy, 2 * sz + qz)
                            if not all(-1 <= v <= 1 for v in o):
                                continue
                            ki = ((o[0] + 1) * 3 + (o[1] + 1)) * 3 + (o[2] + 1)
                            qblk = (qi * 2 + qj) * 2 + qk
                            w = w.at[ti, qblk * Cin:(qblk + 1) * Cin].set(
                                kernel[ki])
    return w


_LOW_DIRS = [d for d in _DIRS if all(v <= 0 for v in d)]  # 7 low-corner dirs


def dense_conv2(
    feats: jax.Array,
    nbr_rows: jax.Array,
    kernel8: jax.Array,
    bias: Optional[jax.Array],
    compute_dtype=jnp.bfloat16,
    mask: Optional[jax.Array] = None,
    relu: bool = False,
    live: Optional[jax.Array] = None,
) -> jax.Array:
    """2^3-support conv across tiles (offsets {-1,0}^3): the packed form
    of a 3^3/stride-2 sparse conv (see pack_stride2_kernel).

    feats: [B, Nt, T^3 * Cin] flat; kernel8: [8, Cin, Cout].
    Only the LOW-side halo exists (7 neighbor directions, 3 face
    arrays, (T+1)^3 halo) — the packed inputs are channel-heavy
    (8x the pre-pack width), so halving slab memory matters at vox10.
    """
    B, Nt, FC = feats.shape
    Cin = kernel8.shape[1]
    Cout = kernel8.shape[-1]
    assert FC % Cin == 0, (FC, Cin)
    size = _size_from_cells(FC // Cin)
    cells = size**3
    kern = kernel8.astype(compute_dtype)
    x = feats.astype(compute_dtype)

    chunk = _pick_chunk(Nt, _chunk_target(size, Cin))
    n_chunks = -(-Nt // chunk)
    pad_tiles = n_chunks * chunk - Nt
    xp = jnp.pad(x, ((0, 0), (0, pad_tiles), (0, 0)))
    nbrp = jnp.pad(nbr_rows, ((0, 0), (0, 0), (0, pad_tiles)), constant_values=Nt)
    maskp = None
    if mask is not None:
        maskp = jnp.pad(mask, ((0, 0), (0, pad_tiles), (0, 0)))
    # Low faces only: directions with sign -1 on their priority axis.
    xs = xp.reshape(B, Nt + pad_tiles, size, size, size, Cin)
    full = slice(0, size)
    slabs = {}
    for axis in range(3):
        sl3 = [full, full, full]
        sl3[axis] = _slab_slice(-1, size)
        sl = xs[:, :, sl3[0], sl3[1], sl3[2]].reshape(B, Nt + pad_tiles, -1)
        slabs[(axis, -1)] = jnp.concatenate(
            [sl, jnp.zeros_like(sl[:, :1])], axis=1
        )
    miss = Nt + pad_tiles
    T1 = size + 1

    def do_chunk(ci):
        start = ci * chunk
        core = jax.lax.dynamic_slice(
            xp, (0, start, 0), (B, chunk, cells * Cin)
        ).reshape(B, chunk, size, size, size, Cin)
        nbr_chunk = jax.lax.dynamic_slice(nbrp, (0, 0, start), (B, 26, chunk))
        piece = {(0, 0, 0): core}
        for di, d in enumerate(_DIRS):
            if d not in _LOW_DIRS:
                continue
            rows = nbr_chunk[:, di]
            rows = jnp.where(rows < Nt, rows, miss)
            a = _face_axis(d)
            g = jax.vmap(lambda arr, r: jnp.take(arr, r, axis=0))(
                slabs[(a, -1)], rows)
            fshape = [size, size, size]
            fshape[a] = 1
            g = g.reshape((B, chunk) + tuple(fshape) + (Cin,))
            sl3 = [full, full, full]
            for ax in range(3):
                if ax != a:
                    sl3[ax] = _slab_slice(d[ax], size)
            piece[d] = g[:, :, sl3[0], sl3[1], sl3[2]]
        # Hierarchical concat into a (T+1)^3 low-haloed block.
        planes_x = []
        for dx in (-1, 0):
            planes_y = []
            for dy in (-1, 0):
                planes_y.append(jnp.concatenate(
                    [piece[(dx, dy, dz)] for dz in (-1, 0)], axis=4))
            planes_x.append(jnp.concatenate(planes_y, axis=3))
        h = jnp.concatenate(planes_x, axis=2).reshape(
            B * chunk, T1, T1, T1, Cin)
        # Single 2^3-support 3D conv (fastest core on v5e — see
        # dense_conv). Tap ti = (sx*2+sy)*2+sz matches the conv's
        # kernel-position order exactly.
        w2 = kern.reshape(2, 2, 2, Cin, Cout)
        acc = _conv3d(h, w2)
        out = acc.reshape(B, chunk, cells, Cout)
        if bias is not None:
            out = out + bias
        if maskp is not None:
            m = jax.lax.dynamic_slice(maskp, (0, start, 0), (B, chunk, cells))
            out = out * m.astype(out.dtype)[..., None]
        if relu:
            out = jnp.maximum(out, 0)
        return out.astype(feats.dtype).reshape(B, chunk, cells * Cout)

    return _chunk_runner(do_chunk, n_chunks, chunk, cells * Cout,
                         feats.dtype, B, live)[:, :Nt]


def apply_mask(grid: TileGrid, feats: jax.Array) -> jax.Array:
    """Zero features outside the candidate mask. feats [B, Nt, T^3 * C].

    Multiply (not where) so XLA broadcasts a [Nt, T^3, 1] scalar mask
    instead of materializing a full-width padded pred array (observed
    1.75GB at vox10 scale)."""
    B, Nt, FC = feats.shape
    cells = grid.mask.shape[-1]
    Cdim = FC // cells
    m = (grid.mask & grid.valid[:, :, None]).astype(feats.dtype)[..., None]
    f = feats.reshape(B, Nt, cells, Cdim)
    return (f * m).reshape(B, Nt, FC)


@_functools.lru_cache(maxsize=None)
def _morton_cell_order(size: int):
    """Static cell enumeration tables for ``size``^3 tiles.

    Returns (local [size^3, 3] cell coords in MORTON order, perm
    [size^3] the x-major storage index of each Morton slot) as numpy
    arrays (trace-time constants)."""
    import numpy as np

    locs = [(x, y, z) for x in range(size) for y in range(size)
            for z in range(size)]

    def code(l):
        c = 0
        for b in range(10):
            c |= (((l[0] >> b) & 1) << (3 * b + 2))
            c |= (((l[1] >> b) & 1) << (3 * b + 1))
            c |= (((l[2] >> b) & 1) << (3 * b))
        return c

    order = sorted(range(len(locs)), key=lambda i: code(locs[i]))
    local = np.asarray([locs[i] for i in order], np.int32)
    return local, np.asarray(order, np.int32)


def extract_sparse(
    grid: TileGrid,
    feats: jax.Array,
    keep_mask: jax.Array,
    capacity: int,
    feats_dtype=jnp.float32,
) -> SparseTensor:
    """Compact kept cells into a canonical (key-sorted) SparseTensor.

    feats [B, Nt, T^3 * C]; keep_mask [B, Nt, T^3]. Cells are enumerated
    tile-major with MORTON cell order inside each tile — under Morton
    packed keys that enumeration IS ascending global key order (tile
    key << 3*log2(T) | cell code, and the stride multiplier is a
    further uniform shift), so one cumsum compaction lands rows in
    canonical order with NO sort. Replaces the per-level argsort over
    up to ~1M compacted rows that the x-major key layout required (the
    measured decode hotspot; STATUS r3 perf model).
    """
    B, Nt = grid.keys.shape
    tile = grid.tile
    cells = tile**3
    Cdim = feats.shape[-1] // cells
    t = grid.stride

    local_np, perm_np = _morton_cell_order(tile)
    local = jnp.asarray(local_np)
    perm = jnp.asarray(perm_np)

    tile_coords = C.unpack(grid.keys)
    cell = tile_coords[:, :, None, :] * tile + local[None, None]  # [B,Nt,cells,3]
    keys = C.pack(jnp.clip(cell * t, 0, C.COORD_RANGE - 1))
    keep = jnp.take(keep_mask, perm, axis=-1) & grid.valid[:, :, None]
    keys = jnp.where(keep, keys, C.INVALID_KEY)
    # Storage is x-major; re-index the cell axis into Morton order.
    feats_m = jnp.take(
        feats.reshape(B, Nt, cells, Cdim), perm, axis=2
    )

    flat_keys = keys.reshape(B, -1)
    flat_feats = feats_m.reshape(B, -1, Cdim)

    def per_item(k_i, f_i):
        kp = k_i != C.INVALID_KEY
        dest = jnp.cumsum(kp.astype(jnp.int32)) - 1
        dest = jnp.where(kp, dest, capacity)
        out_k = jnp.full((capacity,), C.INVALID_KEY, jnp.int32).at[dest].set(k_i, mode="drop")
        out_f = jnp.zeros((capacity, Cdim), f_i.dtype).at[dest].set(f_i, mode="drop")
        count = jnp.minimum(jnp.sum(kp.astype(jnp.int32)), capacity)
        return out_k, out_f, count

    out_keys, out_feats, count = jax.vmap(per_item)(flat_keys, flat_feats)
    return SparseTensor(
        keys=out_keys, feats=out_feats.astype(feats_dtype), count=count, stride=t,
        space_bits=grid.space_bits,
    )
