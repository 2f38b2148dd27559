"""Pallas fused tile convs must match the XLA tile-conv path bit-for-bit
(interpret mode on CPU; the same kernels compile via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcpcga_tpu.ops import pallas_conv as PC
from lcpcga_tpu.ops import tiles as TL


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, Nt, C, Co = 2, 70, 32, 16
    feats = jnp.asarray(rng.standard_normal((B, Nt, 64 * C)).astype(np.float32))
    # Indices beyond Nt exercise the miss-row path.
    nbr = jnp.asarray(rng.integers(0, Nt + 40, (B, 26, Nt)).astype(np.int32))
    W = jnp.asarray(rng.standard_normal((27, C, Co)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal(Co).astype(np.float32))
    mask = jnp.asarray(rng.random((B, Nt, 64)) < 0.5)
    return feats, nbr, W, bias, mask


def test_dense_matches_xla(data):
    feats, nbr, W, bias, mask = data
    ref = TL.dense_conv(feats, nbr, W, bias, mask=mask, relu=True)
    got = PC.tile_conv(feats, nbr, W, bias, mask.astype(jnp.float32),
                       size=4, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(got, np.float32), atol=1e-5)


def test_dense_flip_matches_xla(data):
    feats, nbr, W, bias, mask = data
    ref = TL.dense_conv(feats, nbr, W, bias, mask=mask, flip=True)
    got = PC.tile_conv(feats, nbr, W, bias, mask.astype(jnp.float32),
                       size=4, flip=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(got, np.float32), atol=1e-5)


def test_transpose_matches_xla(data):
    feats, nbr, W, bias, mask = data
    rng = np.random.default_rng(1)
    pf = jnp.asarray(
        rng.standard_normal((feats.shape[0], feats.shape[1], 8 * 32)).astype(np.float32)
    )
    ref = TL.transpose_dense_conv(pf, nbr, W, bias, mask=mask)
    got = PC.tile_conv(pf, nbr, W, bias, mask.astype(jnp.float32),
                       size=2, transpose=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(got, np.float32), atol=1e-5)


def test_dense2_matches_xla(data):
    """Packed 2^3-support conv (the stride-2 analysis path)."""
    feats, nbr, W, bias, mask = data
    rng = np.random.default_rng(2)
    W8 = jnp.asarray(rng.standard_normal((8, 32, 16)).astype(np.float32) * 0.1)
    ref = TL.dense_conv2(feats, nbr, W8, bias, mask=mask, relu=True)
    got = PC.tile_conv2(feats, nbr, W8, bias, mask.astype(jnp.float32),
                        size=4, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(got, np.float32), atol=1e-5)


def test_slab_halo_matches_whole_tile_halo(data):
    """The face-slab halo assembly is bit-identical to whole-tile
    gathers (both tile sizes)."""
    feats, nbr, _, _, _ = data
    B, Nt = feats.shape[:2]
    C = 32
    old = TL._build_halo(feats, nbr, 0, Nt, TL.TILE, C, B, Nt, 0)
    slabs = TL._extract_slabs(feats, TL.TILE, C)
    new = TL._build_halo_slabs(feats, slabs, nbr, 0, Nt, TL.TILE, C, B, Nt, 0)
    np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
