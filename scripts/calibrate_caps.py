"""Weight-aware capacity calibration (VERDICT r4 next-round #2).

The tile/candidate fractions in ``Capacities`` were measured on
random-weight top-k selections (round 2); trained selections differ, so
strict decode overflowed on every round-4 rd_eval row. This script runs
the REAL staged decode with the current weights under deliberately
loose caps, fetches each stage's selected coordinate set, recomputes
the exact tile occupancies host-side (mirroring ops/tiles tile
geometry: TILE=4 child cells, 27-neighborhood dilation), and prints
per-knob recommended fractions (max over stages x a 1.2 margin).

Run ON TPU with trained weights:
    python scripts/calibrate_caps.py [n_points] [weights]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), os.pardir)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 780_000
WEIGHTS = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    REPO, "trained", "weights.msgpack")
TILE = 4


def uniq(a):
    return np.unique(a, axis=0).shape[0]


def upsample_tiles(parent_coords: np.ndarray, stride: int) -> int:
    """Active tiles of build_upsample_grid for parents at ``stride``:
    distinct TILE-cell tiles touched by the 27-dilated children."""
    t = stride // 2
    pcell = parent_coords // t
    lo = np.maximum(pcell - 1, 0) // TILE
    hi = (pcell + 1) // TILE
    corners = []
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                corners.append(np.stack([
                    np.where(sx, hi[:, 0], lo[:, 0]),
                    np.where(sy, hi[:, 1], lo[:, 1]),
                    np.where(sz, hi[:, 2], lo[:, 2]),
                ], axis=1))
    return uniq(np.concatenate(corners, axis=0))


def same_tiles(coords: np.ndarray, stride: int) -> int:
    """Active tiles of TL.rasterize(x, tile=TILE) at ``stride``."""
    return uniq((coords // stride) // TILE)


def main():
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from lcpcga_tpu import ops
    from lcpcga_tpu.codec_runtime import PointCloudCodec
    from lcpcga_tpu.data import QMap, batch_from_clouds, body_cloud
    from lcpcga_tpu.models import Capacities, make_model
    from lcpcga_tpu.utils import load_config

    coords, colors = body_cloud(N, resolution=1024, seed=4_201)
    print(f"cloud: {coords.shape[0]} points", flush=True)

    # Exact per-stride occupancy (margin-1.0 denominators): recommended
    # fractions are then profile-independent — any Capacities with
    # margin >= 1.05 satisfies them (cap(s) = margin * exact(s)).
    exact = {}
    for level in range(6):
        s_ = 1 << level
        exact[s_] = (len(np.unique(coords // s_, axis=0))
                     if s_ > 1 else coords.shape[0])

    # Loose calibration profile.
    # Loose-but-HBM-safe: margin 1.5 + 1.5x tile buffers OOMed 16GB at
    # 780k; these bounds exceed every round-4 measured live count while
    # fitting (the measurement reads LIVE counts, not caps, so caps only
    # need to not overflow).
    # Round-4-proven HBM-safe profile (BENCH_r04 ran it): live counts
    # are measured, caps only bound the buffers. If a stage overflows,
    # its warning appears in the log and the fractions for that stage
    # are lower bounds.
    caps = dataclasses.replace(
        Capacities.for_cloud(coords, margin=1.2),
        tile_fraction=0.62, same_tile_fraction=1.05, post_tile_fraction=1.05,
        cand_factor=18,
    )
    cfg_path = os.path.join(REPO, "configs", "ours.yaml")
    config = load_config(cfg_path)
    model = make_model(config["model"], caps)

    from lcpcga_tpu.data import surface_cloud

    cs, cols = surface_cloud(500, resolution=256, seed=1)
    pc, pf, pv = batch_from_clouds([(cs, cols)], caps.cap(1))
    x0 = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm = QMap(config.get("q_map", {}))
    q0, lam0 = qm(x0, jax.random.PRNGKey(0))
    params = jax.jit(
        lambda r, x, q, lam: model.init(r, x, q, lam, training=True)
    )({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
      x0, q0, lam0)
    with open(WEIGHTS, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    codec = PointCloudCodec(model, params, strict_overflow=False)
    codec.update()

    stats = {"n_points": int(coords.shape[0]), "weights": WEIGHTS,
             "caps": list(caps.caps), "per_q": {}}
    # Sweep the corners + center of the q grid: selection spread varies
    # with q, and the shipped fractions must cover the whole sweep.
    for (qg, qa) in [(0.05, 0.1), (0.4, 0.8), (1.0, 1.0)]:
        t0 = time.time()
        stream, _ = codec.compress(coords, colors, (qg, qa))
        # Staged decode with per-stage coordinate fetches.
        from lcpcga_tpu.coding import octree_decode
        from lcpcga_tpu.codec_runtime import LATENT_STRIDE

        rec, _dbg = codec.decompress(stream, return_debug=True)

        # Stage selections: re-run synthesis stages one by one.
        grid = octree_decode(stream.points_payload, codec.depth - 3,
                             caps.cap(LATENT_STRIDE))
        y_xyz = grid * LATENT_STRIDE
        n_y = y_xyz.shape[0]

        # Reuse decompress plumbing for y_hat/q_hat by calling internal
        # pieces: cheapest correct route is a fresh decompress that
        # stops after each stage — here we only need the coordinate
        # sets, which equal the top-k selections; stage outputs carry
        # them. Rebuild y_hat exactly as decompress does:
        import jax.numpy as jnp

        cap8 = caps.cap(LATENT_STRIDE)
        pc2 = np.zeros((1, cap8, 3), np.int32)
        pv2 = np.zeros((1, cap8), bool)
        pc2[0, :n_y] = y_xyz
        pv2[0, :n_y] = True
        y_coords = ops.from_coords(
            jnp.asarray(pc2), jnp.zeros((1, cap8, 0), jnp.float32),
            jnp.asarray(pv2), stride=LATENT_STRIDE)
        from lcpcga_tpu.codec_runtime import rans_decode, _channel_indexes

        n_z = stream.z_length
        ch = codec.z_medians.shape[0]
        z_vals = rans_decode(stream.z_payload, _channel_indexes(n_z, ch),
                             codec.tables_z).reshape(n_z, ch)
        z_hat_pad = np.zeros((1, caps.cap(32), ch), np.float32)
        z_hat_pad[0, :n_z] = z_vals.astype(np.float32) + codec.z_medians[None, :]
        scales, means, indexes, q_hat = codec._decode_params(
            codec.params, y_coords, jnp.asarray(z_hat_pad))
        idx_np = np.asarray(indexes[0, :n_y]).astype(np.int32)
        cb = means.shape[-1]
        v_y = rans_decode(stream.y_payload, idx_np.ravel(),
                          codec.tables_y).reshape(n_y, cb)
        y_pad = np.zeros((1, cap8, cb), np.float32)
        y_pad[0, :n_y] = v_y.astype(np.float32) + np.asarray(means[0, :n_y])
        y_hat = y_coords.with_feats(jnp.asarray(y_pad))

        k = jnp.asarray([stream.k], jnp.int32)
        xa, qfa, _, _ = codec._synth_a(codec.params, y_hat, q_hat, k)
        xb, qfb, _, _ = codec._synth_b(codec.params, xa, qfa, k)
        xc, _, _ = codec._synth_c(codec.params, xb, qfb, k)

        def sel(st):
            n = int(np.asarray(st.count)[0])
            return np.asarray(st.coords[0, :n])

        y_np = y_xyz
        a_np, b_np, c_np = sel(xa), sel(xb), sel(xc)
        row = {
            "rows": {"y": n_y, "s4": len(a_np), "s2": len(b_np),
                     "s1": len(c_np)},
            # generative upsample tile grids (stride_in -> /2)
            "up_tiles": {
                "8": upsample_tiles(y_np, 8),
                "4": upsample_tiles(a_np, 4),
                "2": upsample_tiles(b_np, 2),
            },
            # same-stride stacks at strides 4, 2 (stage_b/c level
            # stacks) and the post stack at stride 1
            "same_tiles": {
                "4": same_tiles(a_np, 4),
                "2": same_tiles(b_np, 2),
                "1": same_tiles(c_np, 1),
            },
            "t": round(time.time() - t0, 1),
        }
        # implied fractions vs EXACT occupancy denominators
        row["frac"] = {
            "tile_fraction": max(
                row["up_tiles"]["8"] / exact[8],
                row["up_tiles"]["4"] / exact[4],
                row["up_tiles"]["2"] / exact[2]),
            "same_tile_fraction": max(
                row["same_tiles"]["4"] / exact[16],
                row["same_tiles"]["2"] / exact[8]),
            "post_tile_fraction": row["same_tiles"]["1"] / exact[4],
        }
        stats["per_q"][f"{qg},{qa}"] = row
        print(json.dumps({f"{qg},{qa}": row}), flush=True)

    worst = {k: max(r["frac"][k] for r in stats["per_q"].values())
             for k in ("tile_fraction", "same_tile_fraction",
                       "post_tile_fraction")}
    # Consumer profiles have cap(s) = margin * exact(s) with margin >=
    # 1.1; measured fractions are exact-denominated, so the needed
    # cap-denominated fraction is measured / margin_min * safety.
    rec = {k: round(v / 1.1 * 1.15, 3) for k, v in worst.items()}
    stats["measured_max"] = worst
    stats["recommended"] = rec
    # results/ is gitignored — also mirror to the tracked trained/ dir
    # so a fresh checkout keeps the calibration (round-5: a workspace
    # reset dropped results/ and bench fell back to non-strict).
    for out in (os.path.join(REPO, "results", "capacity_calibration.json"),
                os.path.join(REPO, "trained", "capacity_calibration.json")):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(stats, f, indent=1)
    print("RECOMMENDED", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
