"""Encode -> file -> decode round trip (SURVEY.md §7 minimum slice /
test-pyramid item 2): the decoder must reproduce the encoder's
dequantized latents bit-exactly and the reconstruction deterministically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcpcga_tpu import ops
from lcpcga_tpu.codec_runtime import PointCloudCodec
from lcpcga_tpu.coding import Bitstream
from lcpcga_tpu.data import QMap, batch_from_clouds, surface_cloud
from lcpcga_tpu.models import Capacities, ColorModel


@pytest.fixture(scope="module")
def codec():
    caps = Capacities(caps=(512, 512, 512, 384, 384, 384), cand_factor=27, tile_fraction=0.0)
    model = ColorModel(caps=caps, g_a_n1=16, g_a_n2=24, g_a_n3=24,
                       g_s_n1=24, g_s_n2=24, g_s_n3=16,
                       c_bottleneck=24, c_hyper=16)
    coords, colors = surface_cloud(400, resolution=256, seed=7)
    pc, pf, pv = batch_from_clouds([(coords, colors)], 512)
    x = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm = QMap({"lambda_A_min": 0, "lambda_A_max": 6400,
               "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"})
    q, lam = qm(x, jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, q, lam, training=True,
    )
    c = PointCloudCodec(model, params)
    c.update()
    return c, coords, colors


def test_roundtrip_bit_exact_latents(codec):
    c, coords, colors = codec
    stream, enc_dbg = c.compress(coords, colors, (0.5, 0.5))
    blob = stream.to_bytes()
    parsed = Bitstream.from_bytes(blob)
    (rec_coords, rec_colors), dec_dbg = c.decompress(parsed, return_debug=True)

    # Latent coordinate set is lossless.
    assert dec_dbg["n_y"] == enc_dbg["n_y"]
    assert dec_dbg["n_z"] == enc_dbg["n_z"]
    # Dequantized latents agree bit-exactly (encoder simulates decoder).
    np.testing.assert_array_equal(enc_dbg["y_hat"], dec_dbg["y_hat"])
    np.testing.assert_array_equal(enc_dbg["q_hat"], dec_dbg["q_hat"])

    # Reconstruction has exactly k[-1] points, all inside the voxel grid.
    assert rec_coords.shape[0] == stream.k[2] == coords.shape[0]
    assert rec_colors.shape == (coords.shape[0], 3)
    assert rec_coords.min() >= 0 and rec_coords.max() < 1024
    # 8-bit color quantization contract (/root/reference/model/model.py:206)
    assert np.allclose(rec_colors * 255, np.round(rec_colors * 255), atol=1e-4)


def test_decode_deterministic(codec):
    c, coords, colors = codec
    stream, _ = c.compress(coords, colors, (0.2, 0.8))
    a_coords, a_colors = c.decompress(stream)
    b_coords, b_colors = c.decompress(stream)
    np.testing.assert_array_equal(a_coords, b_coords)
    np.testing.assert_array_equal(a_colors, b_colors)


def test_file_roundtrip(codec, tmp_path):
    c, coords, colors = codec
    path = str(tmp_path / "cloud.lcp")
    stream, _ = c.compress(coords, colors, (0.5, 0.5), path=path)
    loaded = Bitstream.load(path)
    r1 = c.decompress(stream)
    r2 = c.decompress(loaded)
    np.testing.assert_array_equal(r1[0], r2[0])
    np.testing.assert_array_equal(r1[1], r2[1])


def test_header_self_contained(codec):
    """v2 container carries n_points/depth/caps so bytes + weights fully
    determine the decoder (VERDICT r1 missing #5; reference decoder
    self-sufficiency /root/reference/model/model.py:267-315)."""
    from lcpcga_tpu.codec_runtime import capacities_for_stream

    c, coords, colors = codec
    stream, enc_dbg = c.compress(coords, colors, (0.5, 0.5))
    parsed = Bitstream.from_bytes(stream.to_bytes())
    assert parsed.n_points == coords.shape[0]
    assert parsed.depth == 10
    assert tuple(parsed.caps) == tuple(c.caps.caps)
    prof = capacities_for_stream(parsed)
    # The FULL buffer-sizing profile round-trips (caps + candidate
    # factor + tile fractions) — a decoder rebuilt from the header must
    # not overflow where the encoder did not.
    assert prof.caps == tuple(c.caps.caps)
    assert prof.cand_factor == c.caps.cand_factor
    assert prof.tile_fraction == c.caps.tile_fraction
    # Fresh decoder from header + weights alone reproduces the latents.
    from lcpcga_tpu.models import ColorModel as _CM

    model2 = _CM(caps=prof, g_a_n1=16, g_a_n2=24, g_a_n3=24,
                 g_s_n1=24, g_s_n2=24, g_s_n3=16,
                 c_bottleneck=24, c_hyper=16)
    dec = PointCloudCodec(model2, c.params, depth=parsed.depth)
    dec.update()
    (rc, _), dec_dbg = dec.decompress(parsed, return_debug=True)
    np.testing.assert_array_equal(enc_dbg["y_hat"], dec_dbg["y_hat"])
    assert rc.shape[0] == parsed.k[2]

    with pytest.raises(ValueError, match="truncated"):
        Bitstream.from_bytes(stream.to_bytes()[:20])


def test_caps_mismatch_raises(codec):
    """Decoding with a codec compiled for a different capacity profile
    must fail loudly, not reconstruct garbage."""
    c, coords, colors = codec
    stream, _ = c.compress(coords, colors, (0.5, 0.5))
    stream.caps = tuple(v * 2 for v in stream.caps)
    with pytest.raises(ValueError, match="capacity profile"):
        c.decompress(stream)


def test_overflow_raises():
    """A frame bigger than any pyramid-level capacity must raise, not
    silently drop coordinates (VERDICT r1 missing #6; SURVEY §7 hard
    part 1)."""
    caps = Capacities(caps=(512, 256, 256, 256, 256, 256), cand_factor=27,
                      tile_fraction=0.0)
    model = ColorModel(caps=caps, g_a_n1=8, g_a_n2=12, g_a_n3=12,
                       g_s_n1=12, g_s_n2=12, g_s_n3=8,
                       c_bottleneck=12, c_hyper=8)
    # 400 spread-out points keep ~400 occupied cells at stride 2
    # > cap(2) = 256 -> the d2 level must overflow.
    coords, colors = surface_cloud(400, resolution=256, seed=3)
    pc, pf, pv = batch_from_clouds([(coords, colors)], 512)
    x = ops.from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
    qm = QMap({"lambda_A_min": 0, "lambda_A_max": 6400,
               "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"})
    q, lam = qm(x, jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, q, lam, training=True,
    )
    c = PointCloudCodec(model, params)
    c.update()
    with pytest.raises(RuntimeError, match="overflow"):
        c.compress(coords, colors, (0.5, 0.5))


def test_roundtrip_at_multiple_operating_points(codec):
    """The 4 paper operating points (/root/reference/plot.py:31-36) all
    round-trip. (Rate responsiveness to Q is a property of trained
    weights — covered by the RD regression tests, not at random init.)"""
    c, coords, colors = codec
    for qg, qa in [(0.05, 0.1), (0.1, 0.2), (0.2, 0.4), (0.4, 0.8)]:
        stream, enc_dbg = c.compress(coords, colors, (qg, qa))
        (rc, _), dec_dbg = c.decompress(stream, return_debug=True)
        np.testing.assert_array_equal(enc_dbg["y_hat"], dec_dbg["y_hat"])
        assert rc.shape[0] == coords.shape[0]


def test_int8_escape_carrier_exact(codec):
    """The int8 residual wire carrier with escapes reproduces the exact
    integer+means values of the int16 carrier for |v| in (127, 32000]."""
    from lcpcga_tpu.codec_runtime import ESC_CAP

    codec, _, _ = codec
    rng = np.random.default_rng(3)
    cap8 = codec.caps.cap(8)
    cb = 8
    n_y = 40
    means = jnp.asarray(rng.standard_normal((1, cap8, cb)).astype(np.float32))
    valid = jnp.asarray(np.arange(cap8)[None, :] < n_y)
    v = rng.integers(-100, 100, size=(1, cap8, cb)).astype(np.float32)
    # Escapes: a handful of wide residuals inside the valid rows.
    v[0, 3, 2] = 500.0
    v[0, 17, 0] = -3000.0
    v[0, n_y - 1, cb - 1] = 31999.0
    v[0, n_y:] = 0.0
    y_feats = jnp.asarray(v) + means

    v8, esc_packed, v16, _, wide = codec._quantize_y(
        y_feats, means, jnp.zeros((1, cap8, cb), jnp.int32), valid
    )
    assert not bool(np.asarray(wide))
    ep = np.asarray(esc_packed[0])
    assert int(ep[-1]) == 3
    # Host reconstruction (encoder side).
    v_host = np.asarray(v8[0, :n_y]).astype(np.int32)
    flat = v_host.reshape(-1)
    flat[ep[:3]] = ep[ESC_CAP:ESC_CAP + 3]
    np.testing.assert_array_equal(v_host, v[0, :n_y].astype(np.int32))

    # Device reconstruction (decoder side).
    v8_pad = np.zeros((1, cap8, cb), np.int8)
    v8_pad[0, :n_y] = np.clip(v[0, :n_y], -127, 127).astype(np.int8)
    ep2 = np.zeros((1, 2 * ESC_CAP), np.int32)
    ep2[0, :ESC_CAP] = -1
    er, ec = np.nonzero(np.abs(v[0, :n_y]) > 127)
    ep2[0, :len(er)] = er * cb + ec
    ep2[0, ESC_CAP:ESC_CAP + len(er)] = v[0, :n_y][er, ec].astype(np.int32)
    y_dev = codec._dequantize_y(jnp.asarray(v8_pad), jnp.asarray(ep2),
                                means, valid)
    ref = codec._dequantize_y16(
        jnp.asarray(v[0][None].astype(np.int16)), means, valid
    )
    np.testing.assert_array_equal(np.asarray(y_dev), np.asarray(ref))
