"""Unit tests for the sparse-tensor substrate against brute-force numpy.

Mirrors SURVEY.md §4's test-pyramid item (1): sparse-conv kernels vs a
dense reference, hash-map ops, top-k/prune.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcpcga_tpu import ops
from lcpcga_tpu.ops import coords as C


def make_cloud(rng, n, lim=64, c=3, stride=1):
    """Random unique voxel coords (multiples of stride) + features."""
    pts = rng.integers(0, lim // stride, size=(3 * n, 3)) * stride
    pts = np.unique(pts, axis=0)
    rng.shuffle(pts)
    pts = pts[:n]
    feats = rng.standard_normal((pts.shape[0], c)).astype(np.float32)
    return pts.astype(np.int32), feats


def canon_order(coords):
    """Rows sorted by the canonical packed key (Morton order) — the
    order SparseTensor rows appear in. np.unique's lexicographic order
    differs."""
    k = np.asarray(C.pack(jnp.asarray(coords.astype(np.int32))))
    return coords[np.argsort(k)]


def build_st(clouds, capacity, stride=1):
    """clouds: list of (coords, feats) -> batched SparseTensor."""
    B = len(clouds)
    Cdim = clouds[0][1].shape[1]
    coords = np.zeros((B, capacity, 3), np.int32)
    feats = np.zeros((B, capacity, Cdim), np.float32)
    valid = np.zeros((B, capacity), bool)
    for b, (p, f) in enumerate(clouds):
        n = p.shape[0]
        coords[b, :n] = p
        feats[b, :n] = f
        valid[b, :n] = True
    return ops.from_coords(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), stride=stride)


def np_dict(p, f):
    return {tuple(q): f[i] for i, q in enumerate(p)}


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    p = rng.integers(0, 1024, size=(100, 3)).astype(np.int32)
    keys = C.pack(jnp.asarray(p))
    back = np.asarray(C.unpack(keys))
    np.testing.assert_array_equal(p, back)
    # keys are unique per unique coordinate and order-consistent
    assert len(np.unique(np.asarray(keys))) == len(np.unique(p, axis=0))


def test_from_coords_sorted_dedup():
    rng = np.random.default_rng(1)
    p, f = make_cloud(rng, 50)
    # duplicate some rows
    p2 = np.concatenate([p, p[:10]])
    f2 = np.concatenate([f, f[:10] + 100])
    st = build_st([(p2, f2)], capacity=128)
    n = int(st.count[0])
    assert n == p.shape[0]
    keys = np.asarray(st.keys[0])
    assert np.all(np.diff(keys[:n]) > 0)
    assert np.all(keys[n:] == C.INVALID_KEY)
    assert np.all(np.asarray(st.feats[0, n:]) == 0)


def test_features_at():
    rng = np.random.default_rng(2)
    p, f = make_cloud(rng, 60)
    st = build_st([(p, f)], capacity=96)
    d = np_dict(p, f)
    # half queries exist, half don't
    q = np.concatenate([p[:20], rng.integers(900, 1024, size=(20, 3))]).astype(np.int32)
    qkeys = C.pack_valid(jnp.asarray(q)[None][0], jnp.ones(40, bool))
    got = np.asarray(ops.features_at(st, qkeys[None])[0])
    for i, row in enumerate(q):
        expect = d.get(tuple(row), np.zeros(3, np.float32))
        np.testing.assert_allclose(got[i], expect, rtol=1e-6)


def brute_conv(p_in, f_in, p_out, W, bias, offsets):
    d = np_dict(p_in, f_in)
    Cout = W.shape[-1]
    out = np.zeros((p_out.shape[0], Cout), np.float32)
    for i, o in enumerate(p_out):
        acc = np.zeros(Cout, np.float32)
        for k, off in enumerate(offsets):
            q = tuple(o + off)
            if q in d:
                acc += d[q] @ W[k]
        out[i] = acc + bias
    return out


@pytest.mark.parametrize("batch", [1, 3])
def test_stride1_conv_vs_brute(batch):
    rng = np.random.default_rng(3)
    clouds = [make_cloud(rng, 40 + 10 * b, lim=32) for b in range(batch)]
    st = build_st(clouds, capacity=128)
    K, Cin, Cout = 27, 3, 5
    W = rng.standard_normal((K, Cin, Cout)).astype(np.float32) * 0.1
    bias = rng.standard_normal(Cout).astype(np.float32)
    nbr = ops.self_kernel_map(st)
    got = ops.sparse_conv_apply(st.feats, nbr, jnp.asarray(W), jnp.asarray(bias), st.valid)
    offsets = np.asarray(C.conv_offsets(3, 1))
    for b, (p, f) in enumerate(clouds):
        n = int(st.count[b])
        keys = np.asarray(st.keys[b, :n])
        p_sorted = np.asarray(C.unpack(jnp.asarray(keys)))
        # map sorted rows back to original features
        d = np_dict(p, f)
        f_sorted = np.stack([d[tuple(q)] for q in p_sorted])
        expect = brute_conv(p_sorted, f_sorted, p_sorted, W, bias, offsets)
        np.testing.assert_allclose(np.asarray(got[b, :n]), expect, rtol=1e-4, atol=1e-4)


def test_scan_path_matches_im2col():
    rng = np.random.default_rng(4)
    p, f = make_cloud(rng, 80, lim=32, c=8)
    st = build_st([(p, f)], capacity=128)
    nbr = ops.self_kernel_map(st)
    W = jnp.asarray(rng.standard_normal((27, 8, 16)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    got_fused = ops.sparse_conv_apply(st.feats, nbr, W, b, st.valid)
    import lcpcga_tpu.ops.conv as conv_mod

    old = conv_mod.IM2COL_ELEMENT_LIMIT
    try:
        conv_mod.IM2COL_ELEMENT_LIMIT = 0
        got_scan = ops.sparse_conv_apply(st.feats, nbr, W, b, st.valid)
    finally:
        conv_mod.IM2COL_ELEMENT_LIMIT = old
    np.testing.assert_allclose(np.asarray(got_fused), np.asarray(got_scan), rtol=1e-4, atol=1e-5)


def test_downsample_map_and_conv():
    rng = np.random.default_rng(5)
    p, f = make_cloud(rng, 70, lim=64)
    st = build_st([(p, f)], capacity=128)
    out_st, nbr = ops.downsample_map(st, capacity=128)
    n_out = int(out_st.count[0])
    got_coords = np.asarray(out_st.coords[0, :n_out])
    expect_coords = canon_order(np.unique((p // 2) * 2, axis=0))
    np.testing.assert_array_equal(got_coords, expect_coords)
    assert out_st.stride == 2

    W = rng.standard_normal((27, 3, 4)).astype(np.float32) * 0.1
    bias = np.zeros(4, np.float32)
    got = ops.sparse_conv_apply(st.feats, nbr, jnp.asarray(W), jnp.asarray(bias), out_st.valid)
    offsets = np.asarray(C.conv_offsets(3, 1))
    n_in = int(st.count[0])
    p_in = np.asarray(st.coords[0, :n_in])
    f_in = np.asarray(st.feats[0, :n_in])
    expect = brute_conv(p_in, f_in, expect_coords, W, bias, offsets)
    np.testing.assert_allclose(np.asarray(got[0, :n_out]), expect, rtol=1e-4, atol=1e-4)


def test_expand_coords_and_transpose_conv():
    rng = np.random.default_rng(6)
    p, f = make_cloud(rng, 30, lim=64, stride=2)
    st = build_st([(p, f)], capacity=64, stride=2)
    up = ops.expand_coords(st, capacity=27 * 64)
    n_up = int(up.count[0])
    got_coords = np.asarray(up.coords[0, :n_up])
    # brute force candidate set
    offs = np.asarray(C.conv_offsets(3, 1))
    cand = (p[:, None, :] + offs[None]).reshape(-1, 3)
    cand = cand[np.all((cand >= 0) & (cand < 1024), axis=1)]
    expect = canon_order(np.unique(cand, axis=0))
    np.testing.assert_array_equal(got_coords, expect)
    assert up.stride == 1

    # transposed conv onto the expanded coords
    nbr = ops.transpose_map(st, up.keys)
    W = rng.standard_normal((27, 3, 4)).astype(np.float32) * 0.1
    bias = rng.standard_normal(4).astype(np.float32)
    got = ops.sparse_conv_apply(st.feats, nbr, jnp.asarray(W), jnp.asarray(bias), up.valid)
    # brute: out[o] += W[k] @ in[o - off_k]
    n_in = int(st.count[0])
    p_in = np.asarray(st.coords[0, :n_in])
    f_in = np.asarray(st.feats[0, :n_in])
    expect_f = brute_conv(p_in, f_in, expect, W, bias, -offs)
    np.testing.assert_allclose(np.asarray(got[0, :n_up]), expect_f, rtol=1e-4, atol=1e-4)


def test_topk_and_prune():
    rng = np.random.default_rng(7)
    clouds = [make_cloud(rng, 50, c=1), make_cloud(rng, 30, c=1)]
    st = build_st(clouds, capacity=64)
    scores = st.feats[..., 0]
    k = jnp.asarray([10, 5])
    mask = ops.topk_mask(st, scores, k)
    for b in range(2):
        n = int(st.count[b])
        s = np.asarray(scores[b, :n])
        kept = np.asarray(mask[b, :n])
        assert kept.sum() == int(k[b])
        thresh = np.sort(s)[::-1][int(k[b]) - 1]
        assert np.all(s[kept] >= thresh)
        assert not np.any(np.asarray(mask[b, n:]))

    pruned = ops.prune(st, mask, capacity=32)
    for b in range(2):
        assert int(pruned.count[b]) == int(k[b])
        n = int(pruned.count[b])
        keys = np.asarray(pruned.keys[b])
        assert np.all(np.diff(keys[:n]) > 0)
        assert np.all(keys[n:] == C.INVALID_KEY)
        # pruned rows are a subset of original with matching features
        orig = {int(kk): np.asarray(st.feats[b, i]) for i, kk in enumerate(np.asarray(st.keys[b]))}
        for i in range(n):
            np.testing.assert_allclose(np.asarray(pruned.feats[b, i]), orig[int(keys[i])])


def test_prune_to_coords():
    rng = np.random.default_rng(8)
    p, f = make_cloud(rng, 40)
    st = build_st([(p, f)], capacity=64)
    target = build_st([(p[:15], f[:15])], capacity=32)
    out = ops.prune_to_coords(st, target.keys, capacity=32)
    assert int(out.count[0]) == 15
    got = set(map(tuple, np.asarray(out.coords[0, :15])))
    assert got == set(map(tuple, p[:15]))


def test_avg_pool():
    rng = np.random.default_rng(9)
    p, f = make_cloud(rng, 40, lim=16)
    st = build_st([(p, f)], capacity=64)
    nbr = ops.self_kernel_map(st)
    out = ops.avg_pool(st, st, nbr)
    n = int(st.count[0])
    p_s = np.asarray(st.coords[0, :n])
    f_s = np.asarray(st.feats[0, :n])
    d = np_dict(p_s, f_s)
    offs = np.asarray(C.conv_offsets(3, 1))
    for i in range(n):
        vals = [d[tuple(p_s[i] + o)] for o in offs if tuple(p_s[i] + o) in d]
        np.testing.assert_allclose(
            np.asarray(out.feats[0, i]), np.mean(vals, axis=0), rtol=1e-5
        )


def test_vmap_consistency_with_single():
    """Batched results equal per-item results (basis for data parallelism)."""
    rng = np.random.default_rng(10)
    clouds = [make_cloud(rng, 30 + b * 7, lim=32) for b in range(4)]
    st = build_st(clouds, capacity=64)
    nbr = ops.self_kernel_map(st)
    W = jnp.asarray(rng.standard_normal((27, 3, 4)).astype(np.float32) * 0.1)
    bias = jnp.zeros(4)
    batched = ops.sparse_conv_apply(st.feats, nbr, W, bias, st.valid)
    for b in range(4):
        single = build_st([clouds[b]], capacity=64)
        nbr1 = ops.self_kernel_map(single)
        one = ops.sparse_conv_apply(single.feats, nbr1, W, bias, single.valid)
        np.testing.assert_allclose(np.asarray(batched[b]), np.asarray(one[0]), rtol=1e-5, atol=1e-6)


def test_dense_lookup_matches_searchsorted():
    """coords.dense_lookup (rank-volume path used for small coordinate
    spaces, e.g. 128^3 training cubes) is exactly coords.lookup."""
    import numpy as np
    from lcpcga_tpu.ops import coords as C

    rng = np.random.default_rng(0)
    space_bits = 5  # 32^3 space -> 32768 cells
    cells = 1 << (3 * space_bits)
    # Table: sorted unique keys + INVALID padding.
    n_valid = 100
    tk = np.sort(rng.choice(cells, size=n_valid, replace=False)).astype(np.int32)
    table = np.full(160, C.INVALID_KEY, np.int32)
    table[:n_valid] = tk
    # Queries: hits, misses inside the space, out-of-space keys, INVALID.
    queries = np.concatenate([
        tk[:40],
        rng.integers(0, cells, 50).astype(np.int32),
        rng.integers(cells, 1 << 24, 20).astype(np.int32),  # out of space
        np.full(5, C.INVALID_KEY, np.int32),
    ])
    ref = np.asarray(C.lookup(jnp.asarray(table), jnp.asarray(queries)))
    got = np.asarray(C.dense_lookup(jnp.asarray(table), jnp.asarray(queries), cells))
    np.testing.assert_array_equal(ref, got)
    # lookup_in dispatches to the dense path for small spaces and the
    # searchsorted path for large ones; both must agree with lookup().
    got_in = np.asarray(C.lookup_in(jnp.asarray(table), jnp.asarray(queries), space_bits))
    np.testing.assert_array_equal(ref, got_in)
    got_big = np.asarray(C.lookup_in(jnp.asarray(table), jnp.asarray(queries), C.COORD_BITS))
    np.testing.assert_array_equal(ref, got_big)


def test_avg_pool_at_dense_matches_sparse():
    """avg_pool_at's dense-volume path equals the kernel_map+avg_pool
    sparse path (queries off the source set, boundary cells, padding)."""
    import numpy as np
    from lcpcga_tpu import ops
    from lcpcga_tpu.ops import coords as C
    from lcpcga_tpu.ops import avg_pool, avg_pool_at, kernel_map

    rng = np.random.default_rng(3)
    B, N, M, side = 2, 60, 90, 16  # space_bits 4 -> dense path
    sc = rng.integers(0, side, (B, N, 3)).astype(np.int32)
    sv = np.zeros((B, N), bool); sv[:, :50] = True
    sf = rng.normal(size=(B, N, 2)).astype(np.float32)
    src_d = ops.from_coords(jnp.asarray(sc), jnp.asarray(sf), jnp.asarray(sv),
                            space_bits=4)
    src_s = ops.from_coords(jnp.asarray(sc), jnp.asarray(sf), jnp.asarray(sv))

    qc = rng.integers(0, side, (B, M, 3)).astype(np.int32)
    qv = np.zeros((B, M), bool); qv[:, :80] = True
    qf = np.zeros((B, M, 1), np.float32)
    q_d = ops.from_coords(jnp.asarray(qc), jnp.asarray(qf), jnp.asarray(qv),
                          space_bits=4)
    q_s = ops.from_coords(jnp.asarray(qc), jnp.asarray(qf), jnp.asarray(qv))

    dense = avg_pool_at(src_d, q_d)
    offs = C.conv_offsets(3, src_s.stride)
    nbr = kernel_map(src_s, q_s.keys, offs)
    sparse = avg_pool(src_s, q_s, nbr)
    np.testing.assert_array_equal(np.asarray(dense.keys), np.asarray(sparse.keys))
    np.testing.assert_allclose(np.asarray(dense.feats), np.asarray(sparse.feats),
                               rtol=1e-5, atol=1e-6)


def test_dense_lookup_stride_shift():
    """Stride-aligned tables use a shifted rank volume (vox10 stride-8
    sets -> 2M cells); misaligned queries must miss, aligned must hit."""
    import numpy as np
    from lcpcga_tpu.ops import coords as C

    rng = np.random.default_rng(7)
    stride = 8
    shift = 9  # 3 * log2(8)
    coords = np.unique(rng.integers(0, 1024 // stride, (200, 3)) * stride, axis=0)
    tk = np.sort(np.asarray(C.pack(jnp.asarray(coords))))
    table = np.full(256, C.INVALID_KEY, np.int32)
    table[:len(tk)] = tk
    # Aligned hits + aligned misses + MISALIGNED queries (stride-4 coords
    # that shift onto occupied slots but must not match) + INVALID.
    mis = coords[:30] + np.array([4, 0, 0])
    qc = np.concatenate([coords[:50], coords[:20] + stride * 16, mis])
    queries = np.concatenate([
        np.asarray(C.pack(jnp.asarray(qc.astype(np.int32)))),
        np.full(4, C.INVALID_KEY, np.int32),
    ])
    ref = np.asarray(C.lookup(jnp.asarray(table), jnp.asarray(queries)))
    cells = 1 << (30 - shift)
    got = np.asarray(C.dense_lookup(jnp.asarray(table), jnp.asarray(queries),
                                    cells, shift))
    np.testing.assert_array_equal(ref, got)
    got_in = np.asarray(C.lookup_in(jnp.asarray(table), jnp.asarray(queries),
                                    C.COORD_BITS, stride=stride, batch=1))
    np.testing.assert_array_equal(ref, got_in)
