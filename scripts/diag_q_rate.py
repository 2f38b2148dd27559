"""Diagnose rate-vs-q: do the payloads respond to the quality map?

CPU, small cloud. Prints per-payload byte sizes and y/z residual stats
at two extreme q settings with the current trained export.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
# sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so the package
# enabled the persistent cache; disable it for this forced-CPU run (CPU
# AOT entries bake in compile-machine features — cross-machine SIGILL).
jax.config.update("jax_compilation_cache_dir", None)

import jax.numpy as jnp
from flax import serialization

from lcpcga_tpu import ops
from lcpcga_tpu.codec_runtime import PointCloudCodec
from lcpcga_tpu.data import QMap, batch_from_clouds, body_cloud, surface_cloud
from lcpcga_tpu.models import Capacities, make_model
from lcpcga_tpu.utils import load_config

WEIGHTS = os.path.join(
    os.path.dirname(__file__), os.pardir,
    "results", "synthetic_flagship", "weights.msgpack")


def main():
    config = load_config(os.path.join(os.path.dirname(WEIGHTS), "config.yaml"))
    coords, colors = body_cloud(12_000, resolution=256, seed=990_001)
    caps = dataclasses.replace(
        Capacities.for_cloud(coords, margin=1.4), same_tile_fraction=1.05)
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
    tag = "RANDOM"
    if os.path.exists(WEIGHTS) and "--random" not in sys.argv:
        with open(WEIGHTS, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        tag = "TRAINED"
    codec = PointCloudCodec(model, params)
    codec.update()

    for qg, qa in [(0.05, 0.1), (0.8, 0.8)]:
        stream, dbg = codec.compress(coords, colors, (qg, qa),
                                     return_debug=True)
        yh = dbg["y_hat"]
        print(f"[{tag}] q=({qg},{qa}): total={len(stream.to_bytes())}B "
              f"y={len(stream.y_payload)}B z={len(stream.z_payload)}B "
              f"pts={len(stream.points_payload)}B n_y={dbg['n_y']} "
              f"n_z={dbg['n_z']} yhat.mean|.|={np.abs(yh).mean():.4f} "
              f"yhat.std={yh.std():.4f} nz={np.count_nonzero(np.round(yh))}",
              flush=True)


if __name__ == "__main__":
    main()
