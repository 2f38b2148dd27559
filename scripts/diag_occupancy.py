"""Per-scale occupancy diagnostics with the current checkpoint.

For each upsampling level: does the candidate set contain the GT cells,
do the occ logits separate GT from non-GT (AUC), and does top-k
selection actually cover GT? Round-4 symptom: final GT coverage 17%.
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

from lcpcga_tpu.data import QMap
from lcpcga_tpu.data.dataset import SyntheticBodyDataset
from lcpcga_tpu.models import Capacities, make_model
from lcpcga_tpu.ops import from_coords, contains, downsample_coords_only
from lcpcga_tpu.utils import load_config

CKPT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(__file__), os.pardir,
    "results", "synthetic_flagship", "weights.msgpack")


def main():
    config = load_config(os.path.join(os.path.dirname(CKPT), "config.yaml"))
    caps = Capacities.for_points(4096)
    model = make_model(config["model"], caps)
    qmap = QMap(config.get("q_map", {}))

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
    q, lam = qmap(x, jax.random.PRNGKey(0))

    params = model.init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                        x, q, lam, training=True)
    if os.path.exists(CKPT) and "--random" not in sys.argv:
        with open(CKPT, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        print(f"loaded {CKPT}")
    else:
        print("RANDOM params")

    def fwd(params):
        return model.apply(params, x, q, lam, training=True,
                           rngs={"noise": jax.random.PRNGKey(3)})

    out = jax.jit(fwd)(params)
    occs = out["occ_predictions"]  # [occ4, occ2, occ1]
    points = out["points"]         # [gt4, gt2, gt1]
    k = np.asarray(out["k"])       # [B,3] counts at [4,2,1]
    print("k per scale:", k.sum(axis=0))

    for name, occ, gt_s, kk in zip(["s4", "s2", "s1"], occs, points, k.T):
        ov = np.asarray(occ.valid)
        logits = np.asarray(occ.feats)[..., 0]
        member = np.asarray(contains(gt_s, occ.keys)) & ov
        n_cand = ov.sum()
        n_gt = int(np.asarray(gt_s.count).sum())
        n_pos = int(member.sum())
        # candidate recall of GT cells
        print(f"[{name}] cand={n_cand} gt={n_gt} pos_in_cand={n_pos} "
              f"recall_of_gt={n_pos/max(n_gt,1)*100:.1f}%")
        # AUC per batch
        aucs, covs = [], []
        for b in range(4):
            vb = ov[b]
            lb, mb = logits[b][vb], member[b][vb]
            if mb.sum() == 0 or (~mb).sum() == 0:
                continue
            order = np.argsort(lb)
            ranks = np.empty_like(order, dtype=np.float64)
            ranks[order] = np.arange(len(lb))
            auc = (ranks[mb].mean() - (mb.sum() - 1) / 2) / (~mb).sum()
            aucs.append(auc)
            # top-k coverage
            kb = int(kk[b])
            sel = np.zeros(len(lb), bool)
            sel[np.argsort(-lb)[:kb]] = True
            covs.append((sel & mb).sum() / max(mb.sum(), 1))
        print(f"    AUC={np.mean(aucs):.4f}  topk_coverage={np.mean(covs)*100:.1f}%")


if __name__ == "__main__":
    main()
