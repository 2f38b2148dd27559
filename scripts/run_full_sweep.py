"""Full-scale RD sweep through the real harness (VERDICT r4 #5).

N held-out synthetic vox10-scale bodies x an SxS (q_a, q_g) grid via
``TestsetRunner`` with ``Capacities.bucketed`` (one compile per point
bucket), plus the in-framework octree+nearest-color anchor sweep, then
RD/Pareto/contour plots and BD tables. Proves compile bucketing +
incremental CSV + the plotting stack sustain a reference-scale sweep.

Run ON TPU:  python scripts/run_full_sweep.py [frames] [grid] [n_points]
Output:      results/sweep_r5/{Ours,OctreeNN}/test.csv, results/sweep_r5/plots/
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)


def main(n_frames=4, grid_steps=21, n_points=700_000):
    import dataclasses

    import jax
    from flax import serialization

    from lcpcga_tpu import ops
    from lcpcga_tpu.codec_runtime import PointCloudCodec
    from lcpcga_tpu.data import QMap, batch_from_clouds, body_cloud, surface_cloud
    from lcpcga_tpu.eval.evaluate import TestsetRunner, default_q_grid
    from lcpcga_tpu.models import Capacities, make_model
    from lcpcga_tpu.utils import load_config

    weights = os.path.join(REPO, "results", "synthetic_v5", "weights.msgpack")
    if not os.path.exists(weights):
        weights = os.path.join(REPO, "trained", "weights.msgpack")
    cfg_path = os.path.join(os.path.dirname(weights), "config.yaml")
    if not os.path.exists(cfg_path):
        cfg_path = os.path.join(REPO, "configs", "ours.yaml")
    config = load_config(cfg_path)
    print(f"weights={weights} grid={grid_steps}x{grid_steps} "
          f"frames={n_frames}x{n_points}", flush=True)

    frames = []
    for i in range(n_frames):
        c, col = body_cloud(n_points, resolution=1024, seed=910_000 + i)
        frames.append({"points": c, "colors": col,
                       "sequence": f"synthetic_test_{i}", "frame": i})
        print(f"frame {i}: {c.shape[0]} points", flush=True)

    # One bucketed profile covers every frame (same bucket by
    # construction); a heterogeneous set would compile once per bucket.
    n_max = max(f["points"].shape[0] for f in frames)
    caps = Capacities.bucketed(n_max, margin=1.1)
    # Calibrated fractions, if scripts/calibrate_caps.py has run.
    for calib in (os.path.join(REPO, "results", "capacity_calibration.json"),
                  os.path.join(REPO, "trained", "capacity_calibration.json")):
        if os.path.exists(calib):
            with open(calib) as f:
                rec = json.load(f)["recommended"]
            caps = dataclasses.replace(
                caps, **{k: float(v) for k, v in rec.items()})
            print(f"calibrated fractions: {rec}", flush=True)
            break

    model = make_model(config["model"], caps)
    cs, cols = surface_cloud(500, resolution=256, seed=1)
    pc, pf, pv = batch_from_clouds([(cs, cols)], caps.cap(1))
    import jax.numpy as jnp

    x0 = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm = QMap(config.get("q_map", {}))
    q0, lam0 = qm(x0, jax.random.PRNGKey(0))
    params = jax.jit(
        lambda r, x, q, lam: model.init(r, x, q, lam, training=True)
    )({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
      x0, q0, lam0)
    with open(weights, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    codec = PointCloudCodec(model, params,
                            strict_overflow=os.environ.get(
                                "LCPCGA_STRICT", "1") == "1")
    codec.update()

    out_root = os.path.join(REPO, "results", "sweep_r5")
    t0 = time.time()

    # Ours. Always include the paper's 4 BD operating points (the grid
    # only contains them at 21 steps; reduced grids would otherwise
    # produce no BD rows — plots.BD_POINTS is (q_g, q_a) while the grid
    # list is (q_a, q_g)).
    from lcpcga_tpu.eval.plots import BD_POINTS

    runner = TestsetRunner(os.path.join(out_root, "Ours"))
    grid = default_q_grid(grid_steps)
    for (qg, qa) in BD_POINTS:
        if (qa, qg) not in grid:
            grid.append((qa, qg))
    df = runner.run_ours(codec, frames, grid)
    t_ours = time.time() - t0
    print(f"Ours sweep: {len(df)} rows in {t_ours/60:.1f} min", flush=True)

    # Anchor sweep (octree+NN; tmc3 absent in-env).
    t1 = time.time()
    anchor_rates = [
        {"scale": 1, "color_bits": 8}, {"scale": 1, "color_bits": 6},
        {"scale": 1, "color_bits": 5}, {"scale": 2, "color_bits": 6},
        {"scale": 2, "color_bits": 5}, {"scale": 2, "color_bits": 4},
        {"scale": 4, "color_bits": 5}, {"scale": 4, "color_bits": 4},
    ]
    arunner = TestsetRunner(os.path.join(out_root, "OctreeNN"))
    adf = arunner.run_octree_baseline(frames, anchor_rates)
    print(f"anchor sweep: {len(adf)} rows in {(time.time()-t1)/60:.1f} min",
          flush=True)

    # Plots + BD.
    from lcpcga_tpu.eval.plots import plot_experiments

    results = plot_experiments(out_root, ["Ours", "OctreeNN"],
                               os.path.join(out_root, "plots"),
                               anchor="OctreeNN")
    # Contour maps over the full grid for the first frame.
    from lcpcga_tpu.eval.plots import plot_contours

    if grid_steps >= 5:
        plot_contours(results["Ours"], os.path.join(out_root, "plots"),
                      frames[0]["sequence"])
    total = time.time() - t0
    with open(os.path.join(out_root, "SWEEP_SUMMARY.json"), "w") as f:
        json.dump({
            "rows_ours": len(df), "rows_anchor": len(adf),
            "grid": grid_steps, "frames": n_frames, "n_points": n_points,
            "wall_clock_s": round(total, 1), "weights": weights,
        }, f, indent=1)
    print(f"TOTAL {total/60:.1f} min; outputs under {out_root}", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
