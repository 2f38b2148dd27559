"""Compare dense tile-conv formulations on the real TPU.

Variants (all numerically equivalent to ops/tiles.dense_conv):
  v0  current dense_conv (27 sliced einsums over a halo buffer)
  v1  z-unrolled im2col: halo -> [*, 4,4,4, 3C] -> 9 matmuls (K=3C)
  v2  full im2col: halo -> [*, 64, 27C] -> 1 matmul (K=27C)
  v3  lax.conv_general_dilated on [chunk, 6,6,6, C]
  t0  current transpose_dense_conv
  t1  unified subpixel matmul: parent 2^3 windows -> [*, 8C] @ [8C, 8*Cout]

Run: python scripts/bench_conv_variants.py [n_tiles] [cin] [cout]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def t(fn, *a, n=3):
    import jax

    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main(n_tiles=229376, cin=128, cout=128, only=None):
    only = set((only or os.environ.get("VARIANTS", "v0,v1,v2,v3,t0,t1")).split(","))
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu.ops import tiles as TL

    # Device-side data gen: the axon tunnel moves ~10-60 MB/s, so host
    # transfers of GB-scale test data are impossibly slow.
    rng = np.random.default_rng(0)
    B = 1
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    feats = (jax.random.normal(ks[0], (B, n_tiles, 64 * cin), jnp.bfloat16) * 0.3)
    nbr = jax.random.randint(ks[1], (B, 26, n_tiles), 0, n_tiles, jnp.int32)
    W = jax.random.normal(ks[2], (27, cin, cout), jnp.float32) * 0.05
    bias = jnp.zeros(cout)
    mask = jax.random.uniform(ks[3], (B, n_tiles, 64)) < 0.4
    jax.block_until_ready((feats, nbr, W, mask))
    print("data ready", flush=True)

    tf = n_tiles * 64 * 27 * cin * cout * 2 / 1e12
    print(f"tiles={n_tiles} cin={cin} cout={cout} flops={tf:.1f} TF", flush=True)

    def report(name, dt):
        print(f"{name}: {dt*1000:.0f} ms  ({tf/dt:.1f} TF/s)", flush=True)

    # v0: current
    v0 = jax.jit(lambda f: TL.dense_conv(f, nbr, W, bias, mask=mask))
    if "v0" in only:
        report("v0 current", t(v0, feats))

    if "p0" in only:
        raise SystemExit('pallas kernels retired in round 5 (see ops/tiles.py note)')

        maskf = mask.astype(jnp.bfloat16)
        p0 = jax.jit(lambda f: PC.tile_conv(f, nbr, W, bias, maskf, size=4))
        report("p0 pallas dense", t(p0, feats))
        if "check" in only:
            ref = np.asarray(v0(feats), np.float32)
            got = np.asarray(p0(feats), np.float32)
            m = np.asarray(mask)[..., None] * np.ones((1, 1, 1, cout))
            m = m.reshape(ref.shape[0], ref.shape[1], -1)
            print(f"  p0 max|err| vs v0: {np.abs(got - ref).max():.4f}", flush=True)

    CHUNK = TL.CONV_TILE_CHUNK
    TILE = TL.TILE

    def build_halo(f, start, chunk):
        return TL._build_halo(
            f, nbrp, start, chunk, TILE, cin, B, n_tiles, pad_tiles
        )

    n_chunks = -(-n_tiles // CHUNK)
    pad_tiles = n_chunks * CHUNK - n_tiles
    nbrp = jnp.pad(nbr, ((0, 0), (0, 0), (0, pad_tiles)), constant_values=n_tiles)
    Wb = W.astype(jnp.bfloat16)

    # v1: z-unrolled im2col, 9 matmuls with K = 3*cin
    # W re-layout: [3(dx),3(dy),3(dz),cin,cout] -> per (dx,dy): [3*cin, cout]
    W9 = W.reshape(3, 3, 3, cin, cout).transpose(0, 1, 2, 3, 4)

    def v1_fn(f):
        fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))

        def do_chunk(ci):
            halo = build_halo(fp, ci * CHUNK, CHUNK)  # [B, chunk, 6,6,6, cin]
            h = halo.reshape(B * CHUNK, 6, 6, 6, cin)
            # unroll z: [B*chunk, 6, 6, 4, 3*cin]
            hz = jnp.concatenate(
                [h[:, :, :, 0:4], h[:, :, :, 1:5], h[:, :, :, 2:6]], axis=-1
            )
            acc = jnp.zeros((B * CHUNK, 4, 4, 4, cout), jnp.float32)
            for dx in range(3):
                for dy in range(3):
                    sl = hz[:, dx : dx + 4, dy : dy + 4]  # [N,4,4,4,3cin]
                    wk = W9[dx, dy].reshape(3 * cin, cout).astype(jnp.bfloat16)
                    acc = acc + jnp.einsum(
                        "nxyzi,io->nxyzo", sl, wk,
                        preferred_element_type=jnp.float32,
                    )
            out = acc.reshape(B, CHUNK, 64, cout) + bias
            return out.astype(f.dtype).reshape(B, CHUNK, 64 * cout)

        chunks = jax.lax.map(do_chunk, jnp.arange(n_chunks))
        return jnp.moveaxis(chunks, 0, 1).reshape(B, -1, 64 * cout)[:, :n_tiles]

    v1 = jax.jit(v1_fn)
    if "v1" in only:
        report("v1 z-unroll", t(v1, feats))

    # v2: full im2col (27*cin) single matmul
    W27 = W.reshape(27 * cin, cout).astype(jnp.bfloat16)

    def v2_fn(f):
        fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))

        def do_chunk(ci):
            halo = build_halo(fp, ci * CHUNK, CHUNK)
            h = halo.reshape(B * CHUNK, 6, 6, 6, cin)
            cols = []
            for dx in range(3):
                for dy in range(3):
                    for dz in range(3):
                        cols.append(h[:, dx : dx + 4, dy : dy + 4, dz : dz + 4])
            col = jnp.stack(cols, axis=4).reshape(B * CHUNK * 64, 27 * cin)
            out = (
                jnp.dot(col, W27, preferred_element_type=jnp.float32)
                .reshape(B, CHUNK, 64, cout)
                + bias
            )
            return out.astype(f.dtype).reshape(B, CHUNK, 64 * cout)

        chunks = jax.lax.map(do_chunk, jnp.arange(n_chunks))
        return jnp.moveaxis(chunks, 0, 1).reshape(B, -1, 64 * cout)[:, :n_tiles]

    v2 = jax.jit(v2_fn)
    if "v2" in only:
        report("v2 full im2col", t(v2, feats))

    # v3: XLA 3D conv
    Wc = W.reshape(3, 3, 3, cin, cout).astype(jnp.bfloat16)

    def v3_fn(f):
        fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))

        def do_chunk(ci):
            halo = build_halo(fp, ci * CHUNK, CHUNK)
            h = halo.reshape(B * CHUNK, 6, 6, 6, cin)
            out = jax.lax.conv_general_dilated(
                h, Wc, (1, 1, 1), "VALID",
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
                preferred_element_type=jnp.float32,
            )
            out = out.reshape(B, CHUNK, 64, cout) + bias
            return out.astype(f.dtype).reshape(B, CHUNK, 64 * cout)

        chunks = jax.lax.map(do_chunk, jnp.arange(n_chunks))
        return jnp.moveaxis(chunks, 0, 1).reshape(B, -1, 64 * cout)[:, :n_tiles]

    v3 = jax.jit(v3_fn)
    if "v3" in only:
        report("v3 XLA conv3d", t(v3, feats))

    # correctness vs v0
    if "check" in only:
        ref = np.asarray(v0(feats), np.float32)
        for name, fn in (("v1", v1), ("v2", v2), ("v3", v3)):
            got = np.asarray(fn(feats), np.float32)
            m = np.asarray(mask)[..., None] * np.ones((1, 1, 1, cout))
            m = m.reshape(ref.shape[0], ref.shape[1], -1)
            err = np.abs(got * m - ref).max()
            print(f"  {name} max|err| vs v0: {err:.4f}", flush=True)

    # concat-based halo: 27 block pieces assembled with hierarchical
    # concatenate — one write of the halo buffer instead of 26
    # copy-on-write slab pastes.
    def build_halo_concat(fp, start, chunk, size=4):
        fc = size ** 3 * cin

        def take_tiles(rows):
            safe = jnp.minimum(rows, n_tiles + pad_tiles - 1)
            g = jax.vmap(lambda a, r: jnp.take(a, r, axis=0))(fp, safe)
            return g * (rows < n_tiles)[..., None].astype(g.dtype)

        core = jax.lax.dynamic_slice(fp, (0, start, 0), (B, chunk, fc))
        core = core.reshape(B, chunk, size, size, size, cin)
        nbr_chunk = jax.lax.dynamic_slice(nbrp, (0, 0, start), (B, 26, chunk))
        piece = {(0, 0, 0): core}
        di = 0
        for d in TL._DIRS:
            tile_d = take_tiles(nbr_chunk[:, di]).reshape(
                B, chunk, size, size, size, cin)
            piece[d] = tile_d[
                :, :, TL._slab_slice(d[0], size), TL._slab_slice(d[1], size),
                TL._slab_slice(d[2], size)]
            di += 1
        rows = []
        for dx in (-1, 0, 1):
            planes = []
            for dy in (-1, 0, 1):
                cols = [piece[(dx, dy, dz)] for dz in (-1, 0, 1)]
                planes.append(jnp.concatenate(cols, axis=4))
            rows.append(jnp.concatenate(planes, axis=3))
        return jnp.concatenate(rows, axis=2)

    def v1c_fn(f):
        fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))

        def do_chunk(ci):
            halo = build_halo_concat(fp, ci * CHUNK, CHUNK)
            h = halo.reshape(B * CHUNK, 6, 6, 6, cin)
            hz = jnp.concatenate(
                [h[:, :, :, 0:4], h[:, :, :, 1:5], h[:, :, :, 2:6]], axis=-1
            )
            acc = jnp.zeros((B * CHUNK, 4, 4, 4, cout), jnp.float32)
            for dx in range(3):
                for dy in range(3):
                    sl = hz[:, dx : dx + 4, dy : dy + 4]
                    wk = W9[dx, dy].reshape(3 * cin, cout).astype(jnp.bfloat16)
                    acc = acc + jnp.einsum(
                        "nxyzi,io->nxyzo", sl, wk,
                        preferred_element_type=jnp.float32,
                    )
            out = acc.reshape(B, CHUNK, 64, cout) + bias
            return out.astype(f.dtype).reshape(B, CHUNK, 64 * cout)

        chunks = jax.lax.map(do_chunk, jnp.arange(n_chunks))
        return jnp.moveaxis(chunks, 0, 1).reshape(B, -1, 64 * cout)[:, :n_tiles]

    v1c = jax.jit(v1c_fn)
    if "v1c" in only:
        report("v1c concat-halo z-unroll", t(v1c, feats))
        if "v0" in only or "check" in only:
            ref = np.asarray(v0(feats), np.float32)
            got = np.asarray(v1c(feats), np.float32)
            m = np.asarray(mask)[..., None] * np.ones((1, 1, 1, cout))
            m = m.reshape(ref.shape[0], ref.shape[1], -1)
            print(f"  v1c max|err| vs v0: {np.abs(got*m-ref).max():.4f}", flush=True)

    def halo_concat_only(f):
        fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))

        def do_chunk(ci):
            return jnp.sum(build_halo_concat(fp, ci * CHUNK, CHUNK).astype(jnp.float32))

        return jnp.sum(jax.lax.map(do_chunk, jnp.arange(n_chunks)))

    if "haloc" in only:
        report("halo concat only", t(jax.jit(halo_concat_only), feats))

    # halo-only cost
    def halo_only(f):
        fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))

        def do_chunk(ci):
            halo = build_halo(fp, ci * CHUNK, CHUNK)
            return jnp.sum(halo.astype(jnp.float32))

        return jnp.sum(jax.lax.map(do_chunk, jnp.arange(n_chunks)))

    if "halo" in only:
        report("halo build only", t(jax.jit(halo_only), feats))

    if not (only & {"t0", "t1"}):
        return
    # ---- transpose ----
    pfeats = jax.random.normal(
        jax.random.PRNGKey(9), (B, n_tiles, 8 * cin), jnp.bfloat16) * 0.3
    tf_t = n_tiles * 64 * 27 / 8 * cin * cout * 2 / 1e12
    print(f"\ntranspose: true flops={tf_t:.1f} TF", flush=True)

    t0 = jax.jit(lambda f: TL.transpose_dense_conv(f, nbr, W, bias, mask=mask))
    if "t0" in only:
        report("t0 current", t(t0, pfeats))

    if "pt" in only:
        raise SystemExit('pallas kernels retired in round 5 (see ops/tiles.py note)')

        maskf = mask.astype(jnp.bfloat16)
        pt = jax.jit(lambda f: PC.tile_conv(f, nbr, W, bias, maskf, size=2,
                                            transpose=True))
        report("pt pallas transpose", t(pt, pfeats))
        if "check" in only:
            ref = np.asarray(t0(pfeats), np.float32)
            got = np.asarray(pt(pfeats), np.float32)
            print(f"  pt max|err| vs t0: {np.abs(got - ref).max():.4f}", flush=True)

    # t1: unified subpixel matmul.
    # parent halo [B, chunk, 4,4,4, cin] (PTILE=2 core + halo 1).
    # child[2u+p + ...] = sum_{s in {0,1}^3} parent[u + base(p,s)] @ Wsub[s,p]
    # where along an axis: p=0 -> only s with offset o=0 i.e. parent u+1? —
    # derive from t0 convention: tap (ox,oy,oz), parity p=|o|&1,
    # shift s=(p-o)//2 in {0,1} (o=-1,p=1 -> s=1; o=0,p=0 -> s=0;
    # o=1,p=1 -> s=0). Parent read = halo[1+s : 1+s+PTILE]. So per axis
    # parity 0 uses only s=0; parity 1 uses s in {0,1}.
    # Unified: window w in {0,1}^3 reading halo[1+w : 1+w+2], weight
    # Wsub[w, p] = W[o] where o = p - 2w per axis if |o|<=1 else 0.
    Wsub = np.zeros((2, 2, 2, cin, 2, 2, 2, cout), np.float32)
    Wn = np.asarray(W).reshape(3, 3, 3, cin, cout)
    for wx in range(2):
        for wy in range(2):
            for wz in range(2):
                for px in range(2):
                    for py in range(2):
                        for pz in range(2):
                            o = (px - 2 * wx, py - 2 * wy, pz - 2 * wz)
                            if all(-1 <= v <= 1 for v in o):
                                Wsub[wx, wy, wz, :, px, py, pz] = Wn[
                                    o[0] + 1, o[1] + 1, o[2] + 1
                                ]
    Wsub = jnp.asarray(Wsub.reshape(8 * cin, 8 * cout), jnp.bfloat16)

    def t1_fn(f):
        fp = jnp.pad(f, ((0, 0), (0, pad_tiles), (0, 0)))

        def do_chunk(ci):
            halo = TL._build_halo(
                fp, nbrp, ci * CHUNK, CHUNK, TL.PTILE, cin, B, n_tiles, pad_tiles
            )  # [B, chunk, 4,4,4, cin]
            h = halo.reshape(B * CHUNK, 4, 4, 4, cin)
            # gather 2^3 windows at each u in {0,1}^2... u + 1 + w for
            # u in {0,1}, w in {0,1} -> indices 1+u+w in [1,3]
            cols = []
            for wx in range(2):
                for wy in range(2):
                    for wz in range(2):
                        cols.append(
                            h[:, 1 + wx : 3 + wx, 1 + wy : 3 + wy, 1 + wz : 3 + wz]
                        )
            col = jnp.stack(cols, axis=4).reshape(B * CHUNK * 8, 8 * cin)
            out = jnp.dot(col, Wsub, preferred_element_type=jnp.float32)
            # [B*chunk, ux,uy,uz(2,2,2), px,py,pz(2,2,2), cout] ->
            # child[2u+p] -> [4,4,4]
            out = out.reshape(B * CHUNK, 2, 2, 2, 2, 2, 2, cout)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # ux,px,uy,py,uz,pz
            out = out.reshape(B, CHUNK, 64, cout) + bias
            return out.astype(f.dtype).reshape(B, CHUNK, 64 * cout)

        chunks = jax.lax.map(do_chunk, jnp.arange(n_chunks))
        return jnp.moveaxis(chunks, 0, 1).reshape(B, -1, 64 * cout)[:, :n_tiles]

    t1 = jax.jit(t1_fn)
    if "t1" in only:
        report("t1 subpixel matmul", t(t1, pfeats))
    if "check" in only:
        ref_t = np.asarray(t0(pfeats), np.float32)
        got_t = np.asarray(t1(pfeats), np.float32)
        m = np.asarray(mask)[..., None] * np.ones((1, 1, 1, cout))
        m = m.reshape(ref_t.shape[0], ref_t.shape[1], -1)
        err = np.abs(got_t * m - ref_t).max()
        print(f"  t1 max|err| vs t0: {err:.4f}", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
