"""Batched multi-frame encode/decode (SURVEY §2.3 eval-side data
parallelism): N frames through one batched device sweep must produce
bit-identical streams to N single-frame compress calls, including when
the batch axis is sharded over a device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcpcga_tpu import ops
from lcpcga_tpu.codec_runtime import PointCloudCodec
from lcpcga_tpu.data import QMap, batch_from_clouds, surface_cloud
from lcpcga_tpu.models import Capacities, ColorModel
from lcpcga_tpu.parallel import data_parallel_mesh


@pytest.fixture(scope="module")
def codec():
    caps = Capacities(caps=(512, 512, 512, 384, 384, 384), cand_factor=27,
                      tile_fraction=0.0)
    model = ColorModel(caps=caps, g_a_n1=16, g_a_n2=24, g_a_n3=24,
                       g_s_n1=24, g_s_n2=24, g_s_n3=16,
                       c_bottleneck=24, c_hyper=16)
    frames = [surface_cloud(380 + 10 * b, resolution=256, seed=b)
              for b in range(4)]
    pc, pf, pv = batch_from_clouds(frames[:1], 512)
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
    return c, frames


def test_batch_matches_single(codec):
    c, frames = codec
    qs = [(0.2, 0.4), (0.5, 0.5), (0.8, 0.2), (0.3, 0.9)]
    streams = c.compress_batch(frames, qs)
    assert len(streams) == 4
    for b, ((coords, colors), q) in enumerate(zip(frames, qs)):
        single, _ = c.compress(coords, colors, q)
        assert streams[b].to_bytes() == single.to_bytes(), f"frame {b}"

    recs = c.decompress_batch(streams)
    for b, (coords, _c) in enumerate(frames):
        rc, rcol = c.decompress(streams[b])
        np.testing.assert_array_equal(recs[b][0], rc)
        np.testing.assert_array_equal(recs[b][1], rcol)
        assert recs[b][0].shape[0] == coords.shape[0]


def test_batch_sharded_over_mesh(codec):
    """Batch axis sharded over the 8-virtual-device CPU mesh produces
    the same streams (collectives-free data parallelism)."""
    c, frames = codec
    mesh = data_parallel_mesh(jax.devices()[:4])
    qs = [(0.2, 0.4)] * 4
    ref = c.compress_batch(frames, qs)
    got = c.compress_batch(frames, qs, mesh=mesh)
    for b in range(4):
        assert got[b].to_bytes() == ref[b].to_bytes(), f"frame {b}"
    recs = c.decompress_batch(got, mesh=mesh)
    ref_recs = c.decompress_batch(ref)
    for b in range(4):
        np.testing.assert_array_equal(recs[b][0], ref_recs[b][0])
        np.testing.assert_array_equal(recs[b][1], ref_recs[b][1])
