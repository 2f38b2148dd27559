"""Tiled analysis transform (packed stride-2 convs, no gathers) must
match the sparse kernel-map path: same coordinate sets, same k counts,
features equal to bf16 tolerance."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcpcga_tpu import ops
from lcpcga_tpu.data import batch_from_clouds, surface_cloud
from lcpcga_tpu.models import Capacities
from lcpcga_tpu.models.transforms import AnalysisTransform
from lcpcga_tpu.ops import tiles as TL
from lcpcga_tpu.ops.conv import sparse_conv_apply
from tests.test_sparse_ops import build_st, make_cloud


@pytest.fixture(scope="module")
def setup():
    coords, colors = surface_cloud(500, resolution=128, seed=2)
    pc, pf, pv = batch_from_clouds([(coords, colors)], 640)
    x = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    ones = jnp.where(x.valid[..., None], 1.0, 0.0)
    x4 = x.with_feats(jnp.concatenate([ones, x.feats], axis=-1))
    q = x.with_feats(
        jnp.where(x.valid[..., None], 0.6, 0.0) * jnp.ones((1, 640, 2))
    )
    caps_sp = Capacities(caps=(640, 640, 512, 384, 384, 384), tile_fraction=0.0)
    caps_tl = dataclasses.replace(caps_sp, tile_fraction=2.0)
    kw = dict(n1=16, n2=24, n3=24)
    m_sp = AnalysisTransform(caps=caps_sp, **kw)
    m_tl = AnalysisTransform(caps=caps_tl, **kw)
    params = m_sp.init(jax.random.PRNGKey(0), x4, q)
    return x4, q, m_sp, m_tl, params


def test_tiled_analysis_matches_sparse(setup):
    x4, q, m_sp, m_tl, params = setup
    ys, qs, ks, ovs = m_sp.apply(params, x4, q)
    yt, qt, kt, ovt = m_tl.apply(params, x4, q)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(kt))
    assert not bool(ovs[0]) and not bool(ovt[0])
    n = int(ys.count[0])
    assert int(yt.count[0]) == n
    np.testing.assert_array_equal(np.asarray(ys.keys[0, :n]),
                                  np.asarray(yt.keys[0, :n]))
    fs = np.asarray(ys.feats[0, :n])
    ft = np.asarray(yt.feats[0, :n])
    # bf16 accumulation differences through ~10 convs.
    rel = np.abs(fs - ft) / (np.abs(fs).mean() + 1e-6)
    assert np.median(rel) < 0.02, np.median(rel)
    assert rel.max() < 0.2, rel.max()
    # q_latent row-aligned with y and numerically tight (short chain).
    qe = np.abs(np.asarray(qs.feats[0, :n]) - np.asarray(qt.feats[0, :n]))
    assert qe.max() < 1e-2, qe.max()


def test_downsample_pack_conv_matches_sparse():
    """ops-level: packed 2^3 conv == 3^3/stride-2 sparse conv (f32)."""
    rng = np.random.default_rng(3)
    clouds = [make_cloud(rng, 90 + 10 * b, lim=64, c=6, stride=1)
              for b in range(2)]
    st = build_st(clouds, capacity=128, stride=1)
    W = jnp.asarray(rng.standard_normal((27, 6, 5)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(5).astype(np.float32))

    d2, nbr = ops.downsample_map(st, 128)
    ref = sparse_conv_apply(st.feats, nbr, W, bias, d2.valid)

    grid, feats = TL.rasterize(st, 256)
    grid2, packed = TL.downsample_pack(grid, feats, 256)
    W8 = TL.pack_stride2_kernel(W)
    nbr2 = TL.neighbor_rows(grid2.keys)
    mask2 = grid2.mask & grid2.valid[:, :, None]
    out = TL.dense_conv2(packed.astype(jnp.float32), nbr2, W8, bias,
                         mask=mask2, compute_dtype=jnp.float32)
    got = TL.extract_sparse(grid2, out, mask2, 128)

    for b in range(2):
        n = int(d2.count[b])
        assert int(got.count[b]) == n
        np.testing.assert_array_equal(np.asarray(got.keys[b, :n]),
                                      np.asarray(d2.keys[b, :n]))
        np.testing.assert_allclose(np.asarray(got.feats[b, :n]),
                                   np.asarray(ref[b, :n]),
                                   rtol=1e-4, atol=1e-5)
