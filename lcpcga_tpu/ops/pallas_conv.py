"""Fused Pallas TPU kernels for the tiled-dense sparse convs.

The XLA formulations of the tile convs (ops/tiles.py) are bound by HBM
layout traffic, not FLOPs: the halo buffer is materialized to HBM
(write + re-read) and every im2col window slice is a strided HBM copy
(~100 GB of pure layout movement per vox10 conv; measured 5 TF/s = 2.5%
MXU on v5e). These kernels keep the halo and the im2col entirely in
VMEM.

Mosaic constraint that shapes the design (measured on v5e, 2026-08):
any STORE whose written extent is width-1 on the dim adjacent to the
lane dim (the z axis of an [.., x, y, z, C] tile) crashes the backend
compiler, as does any register relayout that inserts a unit dim next to
the lanes (z-face paste, z-interleave, stack on z). Full-z-width region
stores, unit-dim inserts on x/y (>= 2 dims from the lanes), and
z-shifted window READS all compile fine. So the halo is assembled in
two stages:

  XLA:    z-EXTEND every tile with its two z-neighbor faces
          ([.., s, s, s+2, C] — a second-minor concat, free-ish in XLA)
          and pre-extract the 4 x/y faces of the extended tiles.
  Pallas: [per 32-tile block] paste the z-extended core + the 8
          (dx, dy) 2D-direction slabs into a VMEM halo — every paste is
          full-z-width — then run the windowed matmuls on the MXU.

The 2D slab scheme is exact: a (dx, dy) slab is the z-extended face of
the (dx, dy, 0) neighbor, whose own z-extension carries the
(dx, dy, +-1) edge/corner data. Gather traffic drops to 8 directions
x s*(s+2) cells vs 26 x s^2 (≈ 0.46x).

Replaces the conv stack of /root/reference/model/blocks.py:78-181 /
transforms.py (MinkowskiEngine CUDA kernels) as the TPU-native hot
path; the XLA path in ops/tiles.py remains the CPU/test reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tiles per kernel block. VMEM at C=128: z-ext halo 1.8MB + double-
# buffered core/faces ~5MB + out ~2MB + weights ~1MB = ~10MB.
BLOCK_TILES = 32
# Tiles per gather super-chunk (whole multiple of BLOCK_TILES).
CHUNK_TILES = 4096

_DIRS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if (dx, dy, dz) != (0, 0, 0)
]

# The 8 in-plane (dx, dy) halo directions; the x-faces serve dx != 0
# (y-sliced for the diagonals), the y-faces serve (0, +-1).
_DIRS2D = [
    (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
]
# Row-table indices (into the 26-dir nbr table) of the (dx, dy, -1),
# (dx, dy, 0), (dx, dy, +1) neighbors per 2D direction.
_DIR2D_ROWS = np.array(
    [[_DIRS.index((dx, dy, dz)) for dz in (-1, 0, 1)] for dx, dy in _DIRS2D],
    np.int32,
)
# Face-array id per 2D direction (the neighbor hands over its OPPOSITE
# face): x-lo, x-hi, y-lo, y-hi = 0..3.
_DIR2D_FACE = np.array(
    [(1 if dx == -1 else 0) if dx != 0 else (3 if dy == -1 else 2)
     for dx, dy in _DIRS2D],
    np.int32,
)
_ZLO_ROW = _DIRS.index((0, 0, -1))
_ZHI_ROW = _DIRS.index((0, 0, 1))


def _slab_slice(dv: int, size: int) -> slice:
    """Source slice in the NEIGHBOR's face for halo direction dv."""
    if dv == -1:
        return slice(size - 1, size)
    if dv == 1:
        return slice(0, 1)
    return slice(0, size)


def _halo_slice(dv: int, size: int) -> slice:
    if dv == -1:
        return slice(0, 1)
    if dv == 1:
        return slice(size + 1, size + 2)
    return slice(1, size + 1)


def _paste_halo_2d(halo_ref, core_ref, g_ref, size: int, zw: int,
                   dirs2d=_DIRS2D):
    """Paste the z-extended core and the 2D-direction slabs.

    halo_ref: [TB, sx+?, sy+?, zw, Cin] scratch; core_ref [1, TB, size,
    size, zw, Cin] (z already extended); g_ref [1, n_dirs, TB, size, zw,
    Cin] (per direction the neighbor's z-extended face plane; in-plane
    dim is y for x-faces, x for y-faces). Every store spans the full z
    width — width-1 z stores crash the Mosaic backend."""
    full = slice(0, size)
    halo_ref[:, 1:size + 1, 1:size + 1, :, :] = core_ref[0]
    for di, (dx, dy) in enumerate(dirs2d):
        face = g_ref[0, di]  # [tb, size, zw, cin]
        if dx != 0:
            piece = face[:, None, :, :, :]          # unit x insert
            if dy != 0:
                piece = piece[:, :, _slab_slice(dy, size), :, :]
                ysl = _halo_slice(dy, size)
            else:
                ysl = slice(1, size + 1)
            halo_ref[:, _halo_slice(dx, size), ysl, :, :] = piece
        else:
            piece = face[:, :, None, :, :]          # unit y insert
            halo_ref[:, 1:size + 1, _halo_slice(dy, size), :, :] = piece


def _dense_kernel(core_ref, g_ref, w_ref, b_ref, out_ref, halo_ref,
                  *, tb: int, cin: int, cout: int, relu: bool, size: int):
    _paste_halo_2d(halo_ref, core_ref, g_ref, size, size + 2)
    h = halo_ref[:]
    cells = size**3
    acc = jnp.zeros((tb * cells, cout), jnp.float32)
    ki = 0
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                win = h[:, dx:dx + size, dy:dy + size, dz:dz + size, :]
                acc = acc + jnp.dot(
                    win.reshape(tb * cells, cin), w_ref[ki],
                    preferred_element_type=jnp.float32,
                )
                ki += 1
    out = acc + b_ref[0][None, :]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype).reshape(tb, cells, cout)


def _transpose_kernel(core_ref, g_ref, w_ref, out_ref, halo_ref,
                      *, tb: int, cin: int, cout: int, size: int):
    """Generative transposed conv: z-extended parent block [TB, size,
    size, size+2, Cin] -> UN-INTERLEAVED child [TB, size^3, 8 * Cout]
    via the unified subpixel matmul (ops/tiles.transpose_dense_conv
    convention). The (parent-cell, parity) -> child-cell interleave +
    bias + mask run in XLA afterwards (Mosaic rejects the 8D relayout)."""
    _paste_halo_2d(halo_ref, core_ref, g_ref, size, size + 2)
    h = halo_ref[:]
    pc = size**3
    child = jnp.zeros((tb * pc, 8 * cout), jnp.float32)
    wi = 0
    for wx in range(2):
        for wy in range(2):
            for wz in range(2):
                win = h[:, 1 + wx:1 + wx + size, 1 + wy:1 + wy + size,
                        1 + wz:1 + wz + size, :]
                child = child + jnp.dot(
                    win.reshape(tb * pc, cin), w_ref[wi],
                    preferred_element_type=jnp.float32,
                )
                wi += 1
    out_ref[0] = child.astype(out_ref.dtype).reshape(tb, pc, 8 * cout)


_LOW_DIRS2D = [(-1, -1), (-1, 0), (0, -1)]
_LOW2D_ROWS = np.array(
    [[_DIRS.index((dx, dy, dz)) for dz in (-1, 0, 1)]
     for dx, dy in _LOW_DIRS2D],
    np.int32,
)
# Within the conv2 face_cat (x-hi, y-hi): x-hi -> 0, y-hi -> 1.
_LOW2D_FACE = np.array([0 if dx != 0 else 1 for dx, dy in _LOW_DIRS2D],
                       np.int32)


def _dense2_kernel(core_ref, g_ref, w_ref, b_ref, out_ref, halo_ref,
                   *, tb: int, cin: int, cout: int, relu: bool, size: int):
    """2^3-support conv (offsets {-1,0}^3) on space-to-depth packed
    tiles — the packed form of a 3^3/stride-2 sparse conv
    (ops/tiles.dense_conv2 / pack_stride2_kernel). Low-side halo only:
    z-extension is z-lo only (zw = size+1), 3 low 2D directions."""
    full = slice(0, size)
    halo_ref[:, 1:size + 1, 1:size + 1, :, :] = core_ref[0]
    for di, (dx, dy) in enumerate(_LOW_DIRS2D):
        face = g_ref[0, di]  # [tb, size, size+1, cin]
        if dx != 0:
            piece = face[:, None, :, :, :]
            if dy != 0:
                piece = piece[:, :, size - 1:size, :, :]
                ysl = slice(0, 1)
            else:
                ysl = slice(1, size + 1)
            halo_ref[:, 0:1, ysl, :, :] = piece
        else:
            piece = face[:, :, None, :, :]
            halo_ref[:, 1:size + 1, 0:1, :, :] = piece
    h = halo_ref[:]
    cells = size**3
    acc = jnp.zeros((tb * cells, cout), jnp.float32)
    ti = 0
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                win = h[:, sx:sx + size, sy:sy + size, sz:sz + size, :]
                acc = acc + jnp.dot(
                    win.reshape(tb * cells, cin), w_ref[ti],
                    preferred_element_type=jnp.float32,
                )
                ti += 1
    out = acc + b_ref[0][None, :]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype).reshape(tb, cells, cout)


# -- XLA-side assembly ------------------------------------------------


def _z_extend(xp, nbrp, size: int, cin: int, lo: bool = True,
              hi: bool = True):
    """z-extend every tile with its z-neighbor faces (XLA).

    xp: [B, Ntp, size^3 * Cin] flat (zero-padded rows past Nt; nbrp
    rows already remapped so misses point at Ntp). Returns
    [B, Ntp, size, size, zw, Cin] where zw = size + lo + hi."""
    B, Ntp, _ = xp.shape
    xs = xp.reshape(B, Ntp, size, size, size, cin)
    parts = []
    if lo:
        zhi_face = jnp.concatenate(
            [xs[:, :, :, :, size - 1:size, :],
             jnp.zeros((B, 1, size, size, 1, cin), xs.dtype)], axis=1)
        rows = jnp.minimum(nbrp[:, _ZLO_ROW], Ntp)
        zl = jax.vmap(lambda a, r: jnp.take(a, r, axis=0))(zhi_face, rows)
        parts.append(zl)
    parts.append(xs)
    if hi:
        zlo_face = jnp.concatenate(
            [xs[:, :, :, :, 0:1, :],
             jnp.zeros((B, 1, size, size, 1, cin), xs.dtype)], axis=1)
        rows = jnp.minimum(nbrp[:, _ZHI_ROW], Ntp)
        zh = jax.vmap(lambda a, r: jnp.take(a, r, axis=0))(zlo_face, rows)
        parts.append(zh)
    return jnp.concatenate(parts, axis=4)


def _extract_faces_2d(xp, size: int, cin: int, faces):
    """Pre-slice plain x/y faces of the (un-extended) tiles, one zero
    miss row appended. xp: [B, Ntp, size^3 * Cin] flat. ``faces``
    selects from (x-lo, x-hi, y-lo, y-hi) = 0..3. Returns
    [B, n_faces, Ntp+1, size * size * Cin] stacked face-major; the face
    plane layout is (in-plane, z, Cin)."""
    B, Ntp = xp.shape[:2]
    xs = xp.reshape(B, Ntp, size, size, size, cin)
    sel = {
        0: xs[:, :, 0, :, :, :],
        1: xs[:, :, size - 1, :, :, :],
        2: xs[:, :, :, 0, :, :],
        3: xs[:, :, :, size - 1, :, :],
    }
    out = []
    for f in faces:
        sl = sel[f].reshape(B, Ntp, size * size * cin)
        out.append(jnp.concatenate([sl, jnp.zeros_like(sl[:, :1])], axis=1))
    return jnp.stack(out, axis=1)  # [B, n_faces, Ntp+1, fc]


def _gather_slabs_2d(face_cat, nbr_chunk, dir_rows, face_ids,
                     rows_per_face: int, size: int, cin: int,
                     lo: bool = True, hi: bool = True):
    """Gather the z-EXTENDED 2D slabs, exactly.

    Per 2D direction the slab's z-middle comes from the (dx, dy, 0)
    neighbor's face and the z-end planes from the (dx, dy, -+1)
    neighbors' faces — sourced INDEPENDENTLY so a missing intermediate
    tile never drops a diagonal contribution (the z-extension of the
    face-owner would).

    face_cat: [B, n_faces * rows_per_face, size*size*cin] (face plane
    layout (in-plane, z, cin)); nbr_chunk: [B, 26, CH] rows (misses
    already remapped to the zero row); dir_rows: [n_dirs, 3] 26-table
    indices of the (z-lo, mid, z-hi) neighbors per direction; face_ids:
    [n_dirs]. Returns [B, n_dirs, CH, size, zw, cin] with
    zw = size + lo + hi."""
    B, _, CH = nbr_chunk.shape
    n_dirs = dir_rows.shape[0]
    part_ids = ([0] if lo else []) + [1] + ([2] if hi else [])
    rows = jnp.stack([nbr_chunk[:, dir_rows[:, p]] for p in part_ids], axis=2)
    # rows: [B, n_dirs, n_parts, CH]
    off = jnp.asarray(face_ids * rows_per_face)
    idx = (rows + off[None, :, None, None]).reshape(B, -1)
    g = jax.vmap(lambda arr, r: jnp.take(arr, r, axis=0))(face_cat, idx)
    g = g.reshape(B, n_dirs, len(part_ids), CH, size, size, cin)
    pieces = []
    for pi, p in enumerate(part_ids):
        if p == 0:      # (dx, dy, -1) neighbor: its z-HI face plane
            pieces.append(g[:, :, pi, :, :, size - 1:size, :])
        elif p == 1:    # (dx, dy, 0) neighbor: full face
            pieces.append(g[:, :, pi])
        else:           # (dx, dy, +1) neighbor: its z-LO face plane
            pieces.append(g[:, :, pi, :, :, 0:1, :])
    return jnp.concatenate(pieces, axis=4) if len(pieces) > 1 else pieces[0]


def _transpose_subpixel_weight(kernel, Cin, Cout):
    """[27, Cin, Cout] -> [8, Cin, 8*Cout] unified subpixel weight
    (ops/tiles.transpose_dense_conv convention)."""
    idx = np.full((2, 2, 2, 2, 2, 2), 27, np.int32)
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
        [kernel, jnp.zeros((1,) + kernel.shape[1:], kernel.dtype)], axis=0
    )
    w = kern_ext[jnp.asarray(idx.reshape(8, 8))]
    return w.transpose(0, 2, 1, 3).reshape(8, Cin, 8 * Cout)


def tile_conv(
    feats: jax.Array,
    nbr_rows: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    mask: jax.Array,
    size: int,
    transpose: bool = False,
    relu: bool = False,
    flip: bool = False,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Fused tiled conv. feats [B, Nt, size^3*Cin]; nbr_rows [B, 26, Nt];
    kernel [27, Cin, Cout]; mask [B, Nt, cells_out] (candidate cells).
    Returns [B, Nt, cells_out * Cout] where cells_out = size^3 for the
    dense conv and (2*size)^3 for the transposed (generative) conv."""
    B, Nt, FC = feats.shape
    Cin = kernel.shape[1]
    Cout = kernel.shape[-1]
    assert FC == size**3 * Cin, (FC, size, Cin)
    cells_out = (2 * size)**3 if transpose else size**3
    out_dtype = out_dtype or feats.dtype
    tb = BLOCK_TILES
    zw = size + 2

    chunk = min(CHUNK_TILES, ((Nt + tb - 1) // tb) * tb)
    n_chunks = -(-Nt // chunk)
    Ntp = n_chunks * chunk
    x = feats.astype(jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (0, Ntp - Nt), (0, 0)))
    nbrp = jnp.pad(
        nbr_rows, ((0, 0), (0, 0), (0, Ntp - Nt)), constant_values=Nt
    )
    nbrp = jnp.where(nbrp < Nt, nbrp, Ntp)
    maskp = jnp.pad(mask.astype(jnp.bfloat16), ((0, 0), (0, Ntp - Nt), (0, 0)))

    xz = _z_extend(xp, nbrp, size, Cin)  # [B, Ntp, s, s, s+2, Cin]
    face_cat = _extract_faces_2d(xp, size, Cin, (0, 1, 2, 3))
    face_cat = face_cat.reshape(B, 4 * (Ntp + 1), size * size * Cin)
    rows_per_face = Ntp + 1

    kern = (kernel[::-1] if flip else kernel).astype(jnp.bfloat16)
    if transpose:
        w = _transpose_subpixel_weight(kern, Cin, Cout)
        kernel_fn = functools.partial(
            _transpose_kernel, tb=tb, cin=Cin, cout=Cout, size=size
        )
        w_spec = pl.BlockSpec((8, Cin, 8 * Cout), lambda b, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w = kern  # [27, Cin, Cout] tap-major
        kernel_fn = functools.partial(
            _dense_kernel, tb=tb, cin=Cin, cout=Cout, relu=relu, size=size
        )
        w_spec = pl.BlockSpec((27, Cin, Cout), lambda b, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    b_arr = (bias if bias is not None else jnp.zeros(Cout)).astype(
        jnp.float32
    ).reshape(1, Cout)

    n_blocks = chunk // tb
    core_spec = pl.BlockSpec((1, tb, size, size, zw, Cin),
                             lambda b, i: (b, i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, 8, tb, size, zw, Cin),
                          lambda b, i: (b, 0, i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, Cout), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM)
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    scratch = [pltpu.VMEM((tb, size + 2, size + 2, zw, Cin), jnp.bfloat16)]

    if transpose:
        pc = size**3
        call = pl.pallas_call(
            kernel_fn,
            grid=(B, n_blocks),
            in_specs=[core_spec, g_spec, w_spec],
            out_specs=pl.BlockSpec((1, tb, pc, 8 * Cout),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, chunk, pc, 8 * Cout),
                                           jnp.float32),
            scratch_shapes=scratch,
            compiler_params=compiler_params,
            interpret=interpret,
        )
    else:
        call = pl.pallas_call(
            kernel_fn,
            grid=(B, n_blocks),
            in_specs=[core_spec, g_spec, w_spec, bias_spec],
            out_specs=pl.BlockSpec((1, tb, cells_out, Cout),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, chunk, cells_out, Cout),
                                           out_dtype),
            scratch_shapes=scratch,
            compiler_params=compiler_params,
            interpret=interpret,
        )

    def do_chunk(ci):
        start = ci * chunk
        core = jax.lax.dynamic_slice(
            xz, (0, start, 0, 0, 0, 0), (B, chunk, size, size, zw, Cin)
        )
        m = jax.lax.dynamic_slice(maskp, (0, start, 0), (B, chunk, cells_out))
        nb = jax.lax.dynamic_slice(nbrp, (0, 0, start), (B, 26, chunk))
        g6 = _gather_slabs_2d(face_cat, nb, _DIR2D_ROWS, _DIR2D_FACE,
                              rows_per_face, size, Cin)
        if not transpose:
            raw = call(core, g6, w, b_arr)  # [B, chunk, cells, Cout]
            out = raw * m.astype(raw.dtype)[..., None]
            return out.reshape(B, chunk, cells_out * Cout)
        raw = call(core, g6, w)  # [B, chunk, pc, 8*Cout] f32, u-major
        child = raw.reshape(B, chunk, size, size, size, 2, 2, 2, Cout)
        child = child.transpose(0, 1, 2, 5, 3, 6, 4, 7, 8)
        out = child.reshape(B, chunk, cells_out, Cout) + b_arr[0]
        out = out * m.astype(out.dtype)[..., None]
        return out.astype(out_dtype).reshape(B, chunk, cells_out * Cout)

    out = _run_chunks(do_chunk, n_chunks, B, chunk)
    return out[:, :Nt]


def _run_chunks(do_chunk, n_chunks: int, B: int, chunk: int):
    """Loop the per-chunk body. lax.map traces the body once (compile
    cost O(1) in n_chunks vs the unrolled python loop's O(n) XLA graphs
    — ~12s/chunk measured); memory stays bounded by one chunk's gather
    slabs either way."""
    if n_chunks == 1:
        return do_chunk(0)
    chunks = jax.lax.map(do_chunk, jnp.arange(n_chunks))
    return jnp.moveaxis(chunks, 0, 1).reshape(B, n_chunks * chunk, -1)


def tile_conv2(
    feats: jax.Array,
    nbr_rows: jax.Array,
    kernel8: jax.Array,
    bias: Optional[jax.Array],
    mask: jax.Array,
    size: int = 4,
    relu: bool = False,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Fused 2^3-support packed conv (the stride-2 analysis path).
    feats [B, Nt, size^3*Cin]; nbr_rows [B, 26, Nt] (full table — the
    3 low 2D directions and the z-lo neighbor are selected here);
    kernel8 [8, Cin, Cout] (pack_stride2_kernel layout); mask
    [B, Nt, size^3]. Returns [B, Nt, size^3 * Cout]."""
    B, Nt, FC = feats.shape
    Cin = kernel8.shape[1]
    Cout = kernel8.shape[-1]
    assert FC == size**3 * Cin, (FC, size, Cin)
    cells = size**3
    out_dtype = out_dtype or feats.dtype
    tb = BLOCK_TILES
    zw = size + 1

    chunk = min(CHUNK_TILES, ((Nt + tb - 1) // tb) * tb)
    n_chunks = -(-Nt // chunk)
    Ntp = n_chunks * chunk
    x = feats.astype(jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (0, Ntp - Nt), (0, 0)))
    nbrp = jnp.pad(
        nbr_rows, ((0, 0), (0, 0), (0, Ntp - Nt)), constant_values=Nt
    )
    nbrp = jnp.where(nbrp < Nt, nbrp, Ntp)
    maskp = jnp.pad(mask.astype(jnp.bfloat16), ((0, 0), (0, Ntp - Nt), (0, 0)))

    xz = _z_extend(xp, nbrp, size, Cin, lo=True, hi=False)
    face_cat = _extract_faces_2d(xp, size, Cin, (1, 3))  # x-hi, y-hi
    face_cat = face_cat.reshape(B, 2 * (Ntp + 1), size * size * Cin)
    rows_per_face = Ntp + 1

    w = kernel8.astype(jnp.bfloat16)
    b_arr = (bias if bias is not None else jnp.zeros(Cout)).astype(
        jnp.float32
    ).reshape(1, Cout)

    kernel_fn = functools.partial(
        _dense2_kernel, tb=tb, cin=Cin, cout=Cout, relu=relu, size=size
    )
    core_spec = pl.BlockSpec((1, tb, size, size, zw, Cin),
                             lambda b, i: (b, i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, 3, tb, size, zw, Cin),
                          lambda b, i: (b, 0, i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((8, Cin, Cout), lambda b, i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, Cout), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM)
    n_blocks = chunk // tb
    call = pl.pallas_call(
        kernel_fn,
        grid=(B, n_blocks),
        in_specs=[core_spec, g_spec, w_spec, bias_spec],
        out_specs=pl.BlockSpec((1, tb, cells, Cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, chunk, cells, Cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((tb, size + 1, size + 1, zw, Cin),
                                   jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def do_chunk(ci):
        start = ci * chunk
        core = jax.lax.dynamic_slice(
            xz, (0, start, 0, 0, 0, 0), (B, chunk, size, size, zw, Cin)
        )
        m = jax.lax.dynamic_slice(maskp, (0, start, 0), (B, chunk, cells))
        nb = jax.lax.dynamic_slice(nbrp, (0, 0, start), (B, 26, chunk))
        g6 = _gather_slabs_2d(face_cat, nb, _LOW2D_ROWS, _LOW2D_FACE,
                              rows_per_face, size, Cin, lo=True, hi=False)
        raw = call(core, g6, w, b_arr)
        out = raw * m.astype(raw.dtype)[..., None]
        return out.reshape(B, chunk, cells * Cout)

    out = _run_chunks(do_chunk, n_chunks, B, chunk)
    return out[:, :Nt]
