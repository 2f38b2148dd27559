"""Tiled-dense generative upsampling must match the streamed gather path
(same parameters, same candidate set, same top-k survivors)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcpcga_tpu import ops
from lcpcga_tpu.models.layers import GenerativeUp
from lcpcga_tpu.ops import tiles as TL
from tests.test_sparse_ops import build_st, make_cloud


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    clouds = []
    for b in range(2):
        p, f = make_cloud(rng, 60 + 20 * b, lim=128, c=12, stride=4)
        clouds.append((p, f))
    st = build_st(clouds, capacity=128, stride=4)
    k = jnp.asarray([150, 200], jnp.int32)
    streamed = GenerativeUp(out_channels=8, cand_capacity=27 * 128,
                            out_capacity=512, tile_capacity=0)
    tiled = GenerativeUp(out_channels=8, cand_capacity=27 * 128,
                         out_capacity=512, tile_capacity=512)
    params = streamed.init(jax.random.PRNGKey(1), st, k)
    return st, k, streamed, tiled, params


def test_tiled_matches_streamed(setup):
    st, k, streamed, tiled, params = setup
    ps, occ_s, _, _ = streamed.apply(params, st, k)
    pt, occ_t, _, _ = tiled.apply(params, st, k)

    for b in range(2):
        ns, nt = int(ps.count[b]), int(pt.count[b])
        assert ns == nt == int(k[b])
        np.testing.assert_array_equal(np.asarray(ps.keys[b, :ns]),
                                      np.asarray(pt.keys[b, :nt]))
        np.testing.assert_allclose(
            np.asarray(ps.feats[b, :ns], np.float32),
            np.asarray(pt.feats[b, :nt], np.float32),
            rtol=0.1, atol=0.05,
        )
        # occupancy logits agree on the shared candidate set
        n_occ_s, n_occ_t = int(occ_s.count[b]), int(occ_t.count[b])
        assert n_occ_s == n_occ_t
        np.testing.assert_array_equal(np.asarray(occ_s.keys[b, :n_occ_s]),
                                      np.asarray(occ_t.keys[b, :n_occ_t]))
        np.testing.assert_allclose(
            np.asarray(occ_s.feats[b, :n_occ_s, 0]),
            np.asarray(occ_t.feats[b, :n_occ_t, 0]),
            rtol=0.1, atol=0.05,
        )


def test_tiled_extract_occ_false(setup):
    st, k, _, tiled, params = setup
    pruned, occ, q_out, _ = tiled.apply(params, st, k, False)
    assert occ is None and q_out is None
    assert int(pruned.count[0]) == int(k[0])


def test_q_branch_matches(setup):
    """The carried quality map upsamples identically on both paths."""
    import jax

    st, k, streamed, tiled, params = setup
    qf = st.with_feats(jnp.tanh(st.feats[..., :2]))
    ps, _, qs, _ = streamed.apply(params, st, k, True, qf)
    pt, _, qt, _ = tiled.apply(params, st, k, True, qf)
    for b in range(2):
        n = int(qs.count[b])
        assert int(qt.count[b]) == n
        np.testing.assert_array_equal(np.asarray(qs.keys[b, :n]), np.asarray(qt.keys[b, :n]))
        np.testing.assert_allclose(np.asarray(qs.feats[b, :n]), np.asarray(qt.feats[b, :n]),
                                   rtol=0.1, atol=0.02)


def test_dense_conv_matches_streamed_conv():
    """ops-level check: dense tile conv == streamed sparse conv (f32)."""
    rng = np.random.default_rng(1)
    p, f = make_cloud(rng, 80, lim=64, c=6, stride=2)
    st = build_st([(p, f)], capacity=128, stride=2)
    # isolated random points share few tiles: worst case 8 tiles/parent
    grid, emb = TL.build_upsample_grid(st, tile_capacity=1024)
    nbr = TL.neighbor_rows(grid.keys)
    W = jnp.asarray(rng.standard_normal((27, 6, 5)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))

    out = TL.transpose_dense_conv(emb, nbr, W, b, compute_dtype=jnp.float32)
    out = TL.apply_mask(grid, out)
    cell_mask = grid.mask & grid.valid[:, :, None]
    got = TL.extract_sparse(grid, out, cell_mask, capacity=27 * 128)

    from lcpcga_tpu.ops import coords as C
    from lcpcga_tpu.ops.conv import sparse_conv_streamed

    cand = ops.expand_coords(st, 27 * 128)
    ref = sparse_conv_streamed(st, cand, -C.conv_offsets(3, 1), W, b,
                               compute_dtype=jnp.float32)
    n = int(cand.count[0])
    assert int(got.count[0]) == n
    np.testing.assert_array_equal(np.asarray(got.keys[0, :n]), np.asarray(cand.keys[0, :n]))
    np.testing.assert_allclose(np.asarray(got.feats[0, :n]), np.asarray(ref[0, :n]),
                               rtol=1e-4, atol=1e-5)


def test_volume_paths_match_sort(monkeypatch):
    """Dense tile-rank volume construction/lookup == the sort/searchsorted
    path (keys, counts, masks, features, neighbor rows) for every op that
    dispatches on _use_volume."""
    rng = np.random.default_rng(11)
    clouds = [make_cloud(rng, 100 + 30 * b, lim=1024, c=5, stride=8)
              for b in range(2)]
    st = build_st(clouds, capacity=256, stride=8)

    def snapshot():
        grid, feats = TL.rasterize(st, 256)
        nbr = TL.neighbor_rows(grid.keys, TL.grid_span(grid))
        sc = TL.scatter_feats(grid, st)
        gu, emb = TL.build_upsample_grid(st, 1024)
        pg, pf = TL.downsample_pack(grid, feats, 256)
        g2, f2 = TL.rasterize(st, 512, tile=2)
        pg2, pf2 = TL.downsample_pack(g2, f2, 256)
        return grid, feats, nbr, sc, gu, emb, pg, pf, g2, f2, pg2, pf2

    # Pin each dispatch explicitly (the default ratio can land either
    # side for this fixture): ratio 0 forces sort, huge forces volume.
    span = 32  # COORD_RANGE // (stride 8 * tile 4)
    monkeypatch.setattr(TL, "VOL_ROWS_RATIO", 0)
    assert not TL._use_volume(span, st.keys.shape[1])
    base = snapshot()
    monkeypatch.setattr(TL, "VOL_ROWS_RATIO", 10**9)
    assert TL._use_volume(span, st.keys.shape[1])
    vol = snapshot()

    names = ["grid", "feats", "nbr", "sc", "gu", "emb", "pg", "pf",
             "g2", "f2", "pg2", "pf2"]
    for name, a, b in zip(names, base, vol):
        if isinstance(a, TL.TileGrid):
            np.testing.assert_array_equal(np.asarray(a.keys),
                                          np.asarray(b.keys), err_msg=name)
            np.testing.assert_array_equal(np.asarray(a.count),
                                          np.asarray(b.count), err_msg=name)
            np.testing.assert_array_equal(np.asarray(a.mask),
                                          np.asarray(b.mask), err_msg=name)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


def test_dense_conv_t2_matches_sparse():
    """T=2 same-stride tile conv == streamed sparse conv on the same
    coordinate set (the low-padding path of the FiLM/post stacks)."""
    rng = np.random.default_rng(7)
    p, f = make_cloud(rng, 120, lim=64, c=6, stride=2)
    st = build_st([(p, f)], capacity=128, stride=2)
    W = jnp.asarray(rng.standard_normal((27, 6, 5)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))

    for tile in (2, 4):
        grid, feats = TL.rasterize(st, tile_capacity=256, tile=tile)
        nbr = TL.neighbor_rows(grid.keys)
        mask = grid.mask & grid.valid[:, :, None]
        out = TL.dense_conv(feats, nbr, W, b, mask=mask,
                            compute_dtype=jnp.float32)
        got = TL.extract_sparse(grid, out, mask, capacity=128)

        from lcpcga_tpu.ops import coords as C
        from lcpcga_tpu.ops.conv import sparse_conv_streamed

        ref = sparse_conv_streamed(st, st, C.conv_offsets(3, st.stride), W, b,
                                   compute_dtype=jnp.float32)
        n = int(st.count[0])
        assert int(got.count[0]) == n
        np.testing.assert_array_equal(np.asarray(got.keys[0, :n]),
                                      np.asarray(st.keys[0, :n]))
        np.testing.assert_allclose(np.asarray(got.feats[0, :n]),
                                   np.asarray(ref[0, :n]),
                                   rtol=1e-4, atol=1e-5)


def test_synthesis_tiled_matches_sparse():
    """Full synthesis transform: tiled and sparse paths agree (same params)."""
    import jax
    from lcpcga_tpu.models import Capacities
    from lcpcga_tpu.models.transforms import SparseSynthesisTransform

    rng = np.random.default_rng(5)
    p, f = make_cloud(rng, 50, lim=128, c=8, stride=8)
    st = build_st([(p, f)], capacity=64, stride=8)
    qf = st.with_feats(jnp.tanh(st.feats[..., :2]))
    k = jnp.asarray([[120, 260, 500]], jnp.int32)

    caps_sparse = Capacities(caps=(768, 768, 512, 256, 256, 256),
                             cand_factor=27, tile_fraction=0.0)
    caps_tiled = Capacities(caps=(768, 768, 512, 256, 256, 256),
                            cand_factor=27, tile_fraction=2.0,
                            same_tile_fraction=2.0, post_tile_fraction=2.0)
    kwargs = dict(c_out=3, n1=8, n2=8, n3=8, c_in=8)
    m_sparse = SparseSynthesisTransform(caps=caps_sparse, **kwargs)
    m_tiled = SparseSynthesisTransform(caps=caps_tiled, **kwargs)
    params = m_sparse.init(jax.random.PRNGKey(0), st, qf, k)
    out_s, _ = m_sparse.apply(params, st, qf, k)
    out_t, _ = m_tiled.apply(params, st, qf, k)
    n = int(out_s.count[0])
    assert int(out_t.count[0]) == n == 500
    # bf16 reduction-order differences flip near-tied occupancy ranks
    # between paths (each path is deterministic and self-consistent,
    # which is the codec contract); require high key agreement and
    # close features on the common set.
    ks = np.asarray(out_s.keys[0, :n])
    kt = np.asarray(out_t.keys[0, :n])
    common, si, ti = np.intersect1d(ks, kt, return_indices=True)
    assert len(common) >= 0.85 * n, f"only {len(common)}/{n} keys agree"
    fs = np.asarray(out_s.feats[0, :n])[si]
    ft = np.asarray(out_t.feats[0, :n])[ti]
    err = np.abs(fs - ft)
    assert np.median(err) < 0.05, np.median(err)


def test_forward_only_chunk_runner_matches_cond_path():
    """The dynamic-trip while_loop chunk runner (forward_only traces, used
    by codec_runtime's stage jits) must be bit-identical to the
    reverse-differentiable lax.cond runner on live-masked chunks."""
    rng = np.random.default_rng(5)
    p, f = make_cloud(rng, 70, lim=64, c=6, stride=2)
    st = build_st([(p, f)], capacity=128, stride=2)
    grid, _ = TL.build_upsample_grid(st, tile_capacity=1024)
    nbr = TL.neighbor_rows(grid.keys)
    feats = jnp.asarray(
        rng.standard_normal((1, grid.keys.shape[1], TL.CELLS * 6)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((27, 6, 5)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    live = jnp.sum(grid.valid, axis=1).astype(jnp.int32)

    ref = jax.jit(lambda x: TL.dense_conv(
        x, nbr, W, b, compute_dtype=jnp.float32, live=live))(feats)

    def fwd(x):
        with TL.forward_only():
            return jax.jit(lambda y: TL.dense_conv(
                y, nbr, W, b, compute_dtype=jnp.float32, live=live))(x)

    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fwd(feats)))
