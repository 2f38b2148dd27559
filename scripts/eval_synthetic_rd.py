"""RD evaluation of the trained synthetic-flagship model.

Sweeps the reference's 4 paper operating points
(/root/reference/plot.py:31-36) plus a small q grid on held-out
synthetic bodies, through the REAL encode -> file -> decode path, and
writes the reference-schema CSV + a summary table.

No real 8iVFBv2 frames are reachable here (zero egress), so the sweep
runs on held-out textured synthetic bodies; deltas vs BASELINE.md are
therefore not directly comparable and the summary says so.

Run: python scripts/eval_synthetic_rd.py [weights_path] [n_points]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

OPERATING_POINTS = [(0.05, 0.1), (0.1, 0.2), (0.2, 0.4), (0.4, 0.8),
                    (0.6, 0.9), (1.0, 1.0)]


REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)


DEFAULT_WEIGHTS = os.path.join(
    REPO, "results", "synthetic_flagship", "weights.msgpack")


def main(weights=DEFAULT_WEIGHTS, n_points=250_000):
    import jax
    from flax import serialization

    from lcpcga_tpu.codec_runtime import PointCloudCodec
    from lcpcga_tpu.data import body_cloud
    from lcpcga_tpu.eval.evaluate import TestsetRunner
    from lcpcga_tpu.models import Capacities, make_model
    from lcpcga_tpu.utils import load_config

    # results/ is gitignored scratch; ONLY the default path falls back
    # to the durable git-tracked weights mirror (an explicitly passed
    # path that does not exist must error, not silently eval the
    # mirror — ADVICE r3).
    if weights == DEFAULT_WEIGHTS and not os.path.exists(weights) \
            and os.path.exists(os.path.join(REPO, "trained", "weights.msgpack")):
        weights = os.path.join(REPO, "trained", "weights.msgpack")
    cfg_path = os.path.join(os.path.dirname(weights), "config.yaml")
    if not os.path.exists(cfg_path):
        cfg_path = os.path.join(REPO, "configs", "ours.yaml")
    config = load_config(cfg_path)
    print(f"weights: {weights}\nconfig:  {cfg_path}", flush=True)

    frames = []
    for i in range(2):
        c, col = body_cloud(n_points, resolution=1024, seed=900_000 + i)
        frames.append({"points": c, "colors": col,
                       "sequence": f"synthetic_val_{i}", "frame": i})
    n_max = max(f["points"].shape[0] for f in frames)
    # Synthetic BODY clouds at vox10 are much sparser than the scanned
    # surfaces Capacities.for_points is calibrated on: almost no
    # stride-2/4 merging, so the per-level fractions must be generous
    # or the pyramid overflows (observed with bucketed(margin=1.1):
    # "capacity overflow during encode").
    from lcpcga_tpu.ops import round_up

    # Measured body-cloud fractions at 150k/1024^3: 0.90 / 0.63 / 0.28 /
    # 0.083 / 0.022 per stride 2..32; sized with ~25% margin.
    base = round_up(int(Capacities.bucket_points(int(n_max * 1.1))))
    caps = dataclasses.replace(
        Capacities(caps=(base, base, round_up(int(base * 0.80)),
                         round_up(int(base * 0.40)),
                         round_up(int(base * 0.12)),
                         round_up(int(base * 0.04)))),
        same_tile_fraction=1.3)
    model = make_model(config["model"], caps)

    # Load exported weights into the model's param structure.
    from lcpcga_tpu import ops
    import jax.numpy as jnp

    from lcpcga_tpu.data import QMap, batch_from_clouds, surface_cloud

    cs, cols = surface_cloud(500, resolution=256, seed=1)
    pc, pf, pv = batch_from_clouds([(cs, cols)], caps.cap(1))
    x0 = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm = QMap(config.get("q_map", {}))
    q0, lam0 = qm(x0, jax.random.PRNGKey(0))
    init = jax.jit(lambda r, x, q, lam: model.init(r, x, q, lam, training=True))
    params = init({"params": jax.random.PRNGKey(1),
                   "noise": jax.random.PRNGKey(2)}, x0, q0, lam0)
    if not os.path.exists(weights):
        # Fall back to the newest per-epoch checkpoint.
        import glob

        ckpts = sorted(glob.glob(os.path.join(os.path.dirname(weights),
                                              "ckpt_*.msgpack")))
        if not ckpts:
            raise FileNotFoundError(f"no weights or checkpoints near {weights}")
        print("using checkpoint", ckpts[-1])
        with open(ckpts[-1], "rb") as f:
            blob = f.read()
        from flax import serialization as _ser

        raw = _ser.msgpack_restore(blob)
        params = _ser.from_state_dict(params, raw["state"]["params"])
    else:
        with open(weights, "rb") as f:
            params = serialization.from_bytes(params, f.read())

    codec = PointCloudCodec(model, params, strict_overflow=False)
    codec.update()

    # Warmup roundtrip so no timed CSV row includes JIT compile time
    # (ADVICE r3: the first row's 410 s compress was compile-inclusive
    # and skewed any aggregation).
    import time as _time

    t0 = _time.time()
    codec.timed_roundtrip(frames[0]["points"].astype(np.int32),
                          frames[0]["colors"].astype(np.float32),
                          (OPERATING_POINTS[0][0], OPERATING_POINTS[0][1]))
    print(f"warmup (compile-inclusive): {_time.time()-t0:.1f}s", flush=True)

    out_dir = os.path.join(os.path.dirname(weights), "rd_eval")
    runner = TestsetRunner(out_dir, resolution=1023, use_pcqm=False)
    df = runner.run_ours(codec, frames,
                         [(qa, qg) for (qg, qa) in OPERATING_POINTS])

    cols_show = ["sequence", "q_g", "q_a", "bpp", "sym_y_psnr",
                 "sym_p2p_psnr", "t_compress", "t_decompress"]
    print(df[cols_show].to_string(index=False))
    summary = os.path.join(out_dir, "SUMMARY.md")
    with open(summary, "w") as f:
        f.write("# RD summary — synthetic_flagship (held-out textured "
                "synthetic bodies)\n\n")
        f.write("NOTE: trained and evaluated on procedural textured "
                "surfaces (no real 8iVFBv2 data reachable in this "
                "environment); not directly comparable to BASELINE.md "
                "numbers which use loot/longdress/soldier/redandblack.\n\n")
        f.write(df[cols_show].to_markdown(index=False))
        f.write("\n")
    print("wrote", summary)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*([args[0]] if args else []),
         **({"n_points": int(args[1])} if len(args) > 1 else {}))
