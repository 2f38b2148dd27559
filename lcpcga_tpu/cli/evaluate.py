"""Evaluation CLI: sweep a trained model over the test set
(/root/reference/evaluate.py's run_testset as a parameterized command)."""

from __future__ import annotations

import argparse
import os

import jax
from flax import serialization

from ..codec_runtime import PointCloudCodec
from ..data.dataset import StaticDataset, SyntheticCubeDataset
from ..eval.evaluate import TestsetRunner, default_q_grid
from ..models import Capacities, make_model
from ..utils import load_config


def load_codec(results_dir: str, capacity: int) -> PointCloudCodec:
    config = load_config(os.path.join(results_dir, "config.yaml"))
    caps = Capacities.for_points(capacity)
    model = make_model(config["model"], caps)
    with open(os.path.join(results_dir, "weights.msgpack"), "rb") as f:
        blob = f.read()
    # Build a parameter template via init on a dummy input.
    from .. import ops
    import jax.numpy as jnp
    from ..data import QMap, batch_from_clouds, surface_cloud

    clouds = [surface_cloud(256, resolution=1024, seed=0)]
    c, fts, v = batch_from_clouds(clouds, caps.cap(1))
    x = ops.from_coords(jnp.asarray(c), jnp.asarray(fts), jnp.asarray(v))
    qm = QMap(config.get("q_map", {}))
    q, lam = qm(x, jax.random.PRNGKey(0))
    init = jax.jit(lambda r, x, q, lam: model.init(r, x, q, lam, training=True))
    template = init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                    x, q, lam)
    params = serialization.from_bytes(template, blob)
    codec = PointCloudCodec(model, params)
    codec.update()
    return codec


def main(argv=None):
    ap = argparse.ArgumentParser(description="Evaluate lcpcga_tpu experiments")
    ap.add_argument("--experiment", required=True, help="results/<experiment> dir")
    ap.add_argument("--results", default="./results")
    ap.add_argument("--data", default=None, help="dataset dir (default: synthetic)")
    ap.add_argument("--grid", type=int, default=21, help="q grid steps per axis")
    ap.add_argument("--capacity", type=int, default=1_100_000)
    args = ap.parse_args(argv)

    exp_dir = os.path.join(args.results, args.experiment)
    codec = load_codec(exp_dir, args.capacity)

    if args.data:
        ds = StaticDataset(args.data, split="test", partition=False)
        frames = [ds[i] for i in range(len(ds))]
    else:
        ds = SyntheticCubeDataset(num_samples=2, cube_size=1024, points_per_cube=100_000)
        frames = [ds[i] for i in range(len(ds))]

    runner = TestsetRunner(exp_dir)
    runner.run_ours(codec, frames, default_q_grid(args.grid))
    print(f"wrote {os.path.join(exp_dir, 'test.csv')}")


if __name__ == "__main__":
    main()
