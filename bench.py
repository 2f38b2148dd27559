"""Benchmark: encode+decode throughput on an 8iVFB-scale vox10 frame.

Headline metric mirroring /root/reference/README.md:116-125: mean
wall-clock compress + decompress of a ~780k-point voxelized human-scale
cloud. Reference (RTX 4090 + EPYC 7542): 0.75 s encode + 1.84 s decode
= 0.386 frames/s. vs_baseline = our_fps / 0.386.

Prints ONE JSON line. Runs on whatever jax.default_backend() is (the
driver provides the real TPU chip).
"""

import json
import os
import signal
import sys
import time

import numpy as np


REF_ENCODE_S = 0.75
REF_DECODE_S = 1.84
BASELINE_FPS = 1.0 / (REF_ENCODE_S + REF_DECODE_S)

N_POINTS = 780_000
WARMUP = 1
ITERS = 3
# Internal deadline: the driver bounds this script with `timeout`; bail
# out with whatever measurements exist rather than losing the round's
# bench line entirely (round-3 driver run: rc=124, no JSON).
DEADLINE_S = float(os.environ.get("LCPCGA_BENCH_DEADLINE_S", "1380"))
_T0 = time.time()
_BEST = {}  # filled with (enc_list, dec_list, bpp) as results arrive
STRICT_USED = [False]


def _log(msg):
    print(f"[bench {time.time()-_T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit_and_exit(*_args):
    """Print the best-known result line (SIGTERM from `timeout`, or the
    internal deadline). Exits 0 only if a post-warmup roundtrip
    completed; a warmup-only (compile-inclusive) timing is emitted with
    value null + nonzero rc so consumers never ingest it as a normal
    bench line (ADVICE r4 #4)."""
    if not _BEST.get("enc"):
        _log("no completed roundtrip yet; nothing to report")
        os._exit(3)
    if _BEST.get("warmup_only"):
        _log("only compile-inclusive warmup finished; reporting null value")
        print(json.dumps({
            "metric": "encode_decode_fps", "value": None, "unit": "frames/s",
            "vs_baseline": None,
            "detail": {"partial": True, "warmup_only": True,
                       "t_encode_compile_s": round(float(np.mean(_BEST["enc"])), 4),
                       "t_decode_compile_s": round(float(np.mean(_BEST["dec"])), 4)},
        }), flush=True)
        os._exit(4)
    _print_result(_BEST["enc"], _BEST["dec"], _BEST["bpp"], _BEST["trained"],
                  _BEST.get("backend", "tpu"), partial=True)
    os._exit(0)


def _print_result(enc, dec, bpp, trained, backend, partial=False):
    t_enc = float(np.mean(enc))
    t_dec = float(np.mean(dec))
    fps = 1.0 / (t_enc + t_dec)
    detail = {
        "n_points": N_POINTS,
        "t_encode_s": round(t_enc, 4),
        "t_decode_s": round(t_dec, 4),
        ("bpp" if trained else "bpp_random_weights"): round(bpp, 3),
        "weights": "trained" if trained else "random",
        "strict_overflow": STRICT_USED[0],
        "backend": backend,
        "iters": len(enc),
    }
    if partial:
        detail["partial"] = True
    sys.stderr.flush()
    print(json.dumps({
        "metric": "encode_decode_fps",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "detail": detail,
    }), flush=True)


def main():
    signal.signal(signal.SIGTERM, _emit_and_exit)
    import jax
    import jax.numpy as jnp

    from lcpcga_tpu.codec_runtime import PointCloudCodec
    from lcpcga_tpu.data import QMap, surface_cloud
    from lcpcga_tpu.models import Capacities, ColorModel
    from lcpcga_tpu import ops

    _log(f"imports done (backend {jax.default_backend()})")
    coords, colors = surface_cloud(N_POINTS, resolution=1024, seed=0)
    n = coords.shape[0]

    # Per-cloud exact capacity profile (a codec level/tier chosen per
    # content class): every buffer is sized to measured occupancy + 20%,
    # which directly scales conv compute. Sweeps over heterogeneous
    # frames use Capacities.bucketed instead (compile once per bucket).
    import dataclasses

    # margin 1.1: the calibrated fractions below are denominated for a
    # margin>=1.05 profile (scripts/calibrate_caps.py); margin 1.2 made
    # the stage-c upsample grid 0.669*1.2*exact(2) tiles -> 3x 3.11 GB
    # bf16 candidate tensors -> 17.25G HBM OOM on the 16G v5e.
    caps = dataclasses.replace(
        Capacities.for_cloud(coords, margin=1.1), same_tile_fraction=1.05
    )
    # Weight-aware fraction calibration (scripts/calibrate_caps.py):
    # tile grids sized to the TRAINED model's top-k spread instead of
    # the round-2 random-weight measurements — smaller grids mean less
    # conv padding AND a strict (zero-overflow) decode.
    here_ = os.path.dirname(os.path.abspath(__file__))
    calibrated = False
    for calib_path in (
        os.path.join(here_, "results", "capacity_calibration.json"),
        # Tracked mirror: results/ is gitignored, so a fresh checkout
        # keeps only this copy (written alongside by calibrate_caps.py).
        os.path.join(here_, "trained", "capacity_calibration.json"),
    ):
        if not os.path.exists(calib_path):
            continue
        with open(calib_path) as f:
            rec = json.load(f).get("recommended", {})
        if rec:
            caps = dataclasses.replace(
                caps, **{k: float(v) for k, v in rec.items()})
            calibrated = True
            _log(f"calibrated fractions ({calib_path}): {rec}")
            break
    model = ColorModel(caps=caps)

    cap1 = caps.cap(1)
    pc = np.zeros((1, cap1, 3), np.int32)
    pf = np.zeros((1, cap1, 3), np.float32)
    pv = np.zeros((1, cap1), bool)
    pc[0, :n], pf[0, :n], pv[0, :n] = coords, colors, True
    x = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm = QMap({"lambda_A_min": 0, "lambda_A_max": 6400,
               "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"})
    q, lam = qm(x, jax.random.PRNGKey(0))
    init = jax.jit(lambda rngs, x, q, lam: model.init(rngs, x, q, lam, training=True))
    params = init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x, q, lam
    )

    # Trained weights when the synthetic-flagship export exists (rate is
    # then meaningful); random weights otherwise (timing-representative:
    # same FLOPs/memory — but top-k selections spread wider than any
    # trained model's, hence strict_overflow=False below).
    here = os.path.dirname(os.path.abspath(__file__))
    trained = False
    for weights in (os.path.join(here, "trained", "weights.msgpack"),
                    "results/synthetic_flagship/weights.msgpack"):
        if os.path.exists(weights):
            from flax import serialization

            with open(weights, "rb") as f:
                params = serialization.from_bytes(params, f.read())
            trained = True
            break

    # Strict overflow when the profile was calibrated for these trained
    # weights (VERDICT r4 weak #2: timing must hold for a COMPLETE
    # reconstruction); random weights / uncalibrated runs keep the
    # warning downgrade because their top-k spread exceeds any surface
    # profile.
    strict = trained and calibrated
    STRICT_USED[0] = strict
    codec = PointCloudCodec(model, params, strict_overflow=strict)
    _log(f"codec built (strict_overflow={strict}); update() ...")
    codec.update()
    _log("update done; warmup (compile) ...")

    backend = jax.default_backend()
    # Warmup (compile).
    for _ in range(WARMUP):
        try:
            r = codec.timed_roundtrip(coords, colors, (0.2, 0.4))
        except RuntimeError as e:
            if "overflow" not in str(e) or not strict:
                raise
            # Calibration did not cover this content: retry non-strict
            # and say so in the result rather than losing the bench.
            _log(f"strict decode overflowed ({e}); retrying non-strict")
            strict = False
            STRICT_USED[0] = False
            codec = PointCloudCodec(model, params, strict_overflow=False)
            codec.update()
            r = codec.timed_roundtrip(coords, colors, (0.2, 0.4))
        # Warmup timings are compile-inclusive — only used if nothing
        # better lands before the deadline.
        _BEST.update(enc=[r["t_compress"]], dec=[r["t_decompress"]],
                     bpp=r["bpp"], trained=trained, backend=backend,
                     warmup_only=True)
    _log(f"warmup done ({r['t_compress']:.2f}s/{r['t_decompress']:.2f}s)")

    enc, dec = [], []
    for i in range(ITERS):
        r = codec.timed_roundtrip(coords, colors, (0.2, 0.4))
        enc.append(r["t_compress"])
        dec.append(r["t_decompress"])
        _BEST.update(enc=list(enc), dec=list(dec), bpp=r["bpp"],
                     trained=trained, backend=backend, warmup_only=False)
        _log(f"iter {i}: {r['t_compress']:.2f}s/{r['t_decompress']:.2f}s")
        if time.time() - _T0 > DEADLINE_S:
            _log("internal deadline reached; reporting partial mean")
            break

    _print_result(enc, dec, r["bpp"], trained, backend)


if __name__ == "__main__":
    main()
