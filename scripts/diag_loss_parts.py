"""Decompose the training loss with the current checkpoint.

CPU, one training-style batch. Prints each loss part, latent stats
(y std, scale-floor fraction, mean magnitudes), FiLM beta/gamma stats,
and per-loss gradient norms split by parameter subtree — to find why
training plateaus (round-4: loss stuck ~600 for 14 epochs, y latent
collapsed, no rate response to Q).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", None)

import jax.numpy as jnp
import numpy as np
from flax import serialization

from lcpcga_tpu.data import QMap, body_cloud
from lcpcga_tpu.data.dataset import SyntheticBodyDataset
from lcpcga_tpu.models import Capacities, make_model
from lcpcga_tpu.ops import from_coords, features_at
from lcpcga_tpu.training.loss import Loss
from lcpcga_tpu.utils import load_config

CKPT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(__file__), os.pardir,
    "results", "synthetic_flagship", "ckpt_020.msgpack")


def tree_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return float(jnp.sqrt(sum(jnp.vdot(l, l).real for l in leaves))) if leaves else 0.0


def main():
    config = load_config(os.path.join(os.path.dirname(CKPT), "config.yaml"))
    caps = Capacities.for_points(4096)
    model = make_model(config["model"], caps)
    qmap = QMap(config.get("q_map", {}))
    loss_fn = Loss(config["loss"])

    ds = SyntheticBodyDataset(num_frames=1, points_per_frame=600_000,
                              min_points=300, transform=None)
    idxs = [3, 10, 20, 40]
    coords = np.zeros((4, 4096, 3), np.int32)
    feats = np.zeros((4, 4096, 3), np.float32)
    valid = np.zeros((4, 4096), bool)
    for b, i in enumerate(idxs):
        item = ds[i]
        p, f = item["points"], item["colors"]
        n = min(len(p), 4096)
        coords[b, :n], feats[b, :n], valid[b, :n] = p[:n], f[:n], True

    x = from_coords(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid),
                    space_bits=7)
    rng = jax.random.PRNGKey(0)
    q, lam = qmap(x, rng)

    params = model.init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                        x, q, lam, training=True)
    with open(CKPT, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    print(f"loaded {CKPT}")

    def fwd(params, q, lam):
        out = model.apply(params, x, q, lam, training=True,
                          rngs={"noise": jax.random.PRNGKey(3)})
        total, parts = loss_fn(x, out)
        return total, (parts, out)

    (total, (parts, out)) = jax.jit(fwd)(params, q, lam)
    print(f"total={float(total):.3f}")
    for k, v in parts.items():
        print(f"  {k}: {float(v):.4f}")

    y = out["y"]
    yv = np.asarray(y.feats)[np.asarray(y.valid)]
    print(f"y: std={yv.std():.4f} absmean={np.abs(yv).mean():.4f} "
          f"max|y|={np.abs(yv).max():.2f}")
    # per-channel std distribution
    ystd = yv.std(axis=0)
    print(f"y per-channel std: min={ystd.min():.4f} med={np.median(ystd):.4f} max={ystd.max():.4f}")

    # scales/means from the entropy model: re-run hyperprior pieces
    lik_y = np.asarray(out["likelihoods"]["y"] if not isinstance(out["likelihoods"]["y"], list)
                       else out["likelihoods"]["y"][0])
    ybits = -np.log2(np.clip(lik_y, 1e-12, None))
    print(f"y bits/element mean={ybits.mean():.4f}  total_y_bits={ybits.sum():.0f}")
    lik_z = np.asarray(out["likelihoods"]["z"] if not isinstance(out["likelihoods"]["z"], list)
                       else out["likelihoods"]["z"][0])
    zbits = -np.log2(np.clip(lik_z, 1e-12, None))
    print(f"z bits/element mean={zbits.mean():.4f}  total_z_bits={zbits.sum():.0f}")

    # color prediction quality
    pred = out["prediction"]
    pc = np.asarray(features_at(pred, x.keys))
    gt = np.asarray(x.feats)
    m = np.asarray(x.valid)
    mse = ((pc - gt) ** 2)[m].mean()
    print(f"color MSE at GT coords: {mse:.5f} (PSNR {10*np.log10(1.0/max(mse,1e-9)):.2f} dB)")
    # how many GT points are covered by the prediction?
    from lcpcga_tpu.ops import contains
    cov = np.asarray(contains(pred, x.keys))[m].mean()
    print(f"GT coverage by prediction: {cov*100:.2f}%")

    # gradient norms per loss part, split by subtree
    names = list(loss_fn.losses.keys())
    for name in names:
        def single(params):
            out = model.apply(params, x, q, lam, training=True,
                              rngs={"noise": jax.random.PRNGKey(3)})
            return loss_fn.losses[name](x, out)
        g = jax.jit(jax.grad(single))(params)
        p = g["params"]
        subs = {k: tree_norm(v) for k, v in p.items()}
        print(f"grad[{name}]: " + "  ".join(f"{k}={v:.3g}" for k, v in subs.items()))


if __name__ == "__main__":
    main()
