"""Config-driven trainer with per-epoch checkpoint / auto-resume.

TPU-native re-design of /root/reference/train.py:48-339. Same YAML
schema (configs compatible with the reference's Ours.yaml), same
training contract:

  * dual optimizers (main vs entropy-bottleneck quantiles,
    /root/reference/train.py:63-74) — here one fused jitted step;
  * StepLR schedule + grad-clip 1.0 (/root/reference/train.py:76-78,203);
  * per-epoch checkpoint ckpt_{epoch:03d} with auto-resume from the
    newest (/root/reference/train.py:142-149,287-319);
  * periodic validation through the REAL compress->decompress path
    (/root/reference/train.py:223-285) — not just forward();
  * final weights export after update() (/root/reference/train.py:165-169).

Differences: data parallelism over a device mesh is built in (the
batch axis shards; see parallel/), and checkpoints are flax msgpack
pytrees instead of torch pickles.
"""

from __future__ import annotations

import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..data.dataset import Loader, StaticDataset, SyntheticCubeDataset
from ..data.qmap import QMap
from ..data.transform import build_transforms
from ..models import Capacities, make_model
from ..parallel import create_train_state, data_parallel_mesh, make_train_step, shard_batch
from ..utils import AverageMeter, save_config
from .loss import Loss


class Training:
    def __init__(self, config: dict, dataset=None, use_mesh: bool = False):
        self.config = config
        self.epochs = config.get("epochs", 200)
        self.batch_size = config.get("batch_size", 8)
        self.results_dir = os.path.join(
            config.get("results_path", "./results"), config.get("experiment_name", "run")
        )
        os.makedirs(self.results_dir, exist_ok=True)
        save_config(config, os.path.join(self.results_dir, "config.yaml"))

        # Data.
        if dataset is None:
            data_path = config.get("data_path")
            transform = build_transforms(config.get("transforms", {}).get("train", {}))
            if data_path and (
                os.path.exists(os.path.join(data_path, "train.npz"))
                or os.path.exists(os.path.join(data_path, "config.yaml"))
            ):
                dataset = StaticDataset(
                    data_path,
                    split="train",
                    transform=transform,
                    min_points=config.get("min_points_train", 300),
                )
            else:
                dataset = SyntheticCubeDataset(
                    num_samples=config.get("synthetic_samples", 64),
                    transform=transform,
                )
        self.dataset = dataset

        cube = config.get("cube_size", 128)
        cap = config.get("capacity", 8192)
        self.caps = Capacities(
            caps=(cap, cap, max(256, cap // 2), max(256, cap // 4),
                  max(256, cap // 8), max(256, cap // 8)),
            tile_fraction=config.get("tile_fraction", 0.7),
            # Gather-based same-stride stacks in the fused train step:
            # the tiled stacks are a decode-scale runtime win but make
            # the (already long) train-program compile slower; numerics
            # are path-equivalent (tests/test_tiles.py).
            same_tile_fraction=float(config.get("same_tile_fraction", 0.0)),
            # Sparse analysis in the training step: the deeply-chunked
            # tiled analysis makes the fused train program pathologically
            # slow to compile; path choice is encoder-runtime-only.
            analysis_tiles=bool(config.get("analysis_tiles", False)),
        )
        self.loader = Loader(dataset, self.batch_size, capacity=cap,
                             seed=config.get("seed", 0))

        # Model + step.
        self.model = make_model(config["model"], self.caps)
        self.qmap = QMap(config.get("q_map", {}))
        self.loss = Loss(config.get("loss", {}))
        self.rng = jax.random.PRNGKey(config.get("seed", 0))

        # Per-axis coordinate bound of the training cubes: enables the
        # dense rank-volume lookup path in every step op (128^3 -> 7).
        # Must cover every transform's block_size: a transform emitting
        # coords >= 2**space_bits would make from_coords silently drop
        # those rows as invalid (ADVICE r4 #5).
        for tname, tcfg in (config.get("transforms", {}).get("train", {}) or {}).items():
            bs = tcfg.get("block_size") if isinstance(tcfg, dict) else None
            if bs is not None and int(bs) > int(cube):
                raise ValueError(
                    f"transform {tname!r} block_size={bs} exceeds cube_size="
                    f"{cube}; coords would overflow the {cube}^3 space")
        self.space_bits = max(1, int(cube) - 1).bit_length()

        coords, feats, valid = next(iter(self.loader))
        from .. import ops

        x = ops.from_coords(jnp.asarray(coords), jnp.asarray(feats),
                            jnp.asarray(valid), space_bits=self.space_bits)
        q, lam = self.qmap(x, self.rng)
        init = jax.jit(
            lambda rngs, x, q, lam: self.model.init(rngs, x, q, lam, training=True)
        )
        params = init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x, q, lam
        )

        steps_per_epoch = max(1, len(self.loader))
        self.state, opt, aux_opt = create_train_state(
            self.model,
            params,
            lr=config.get("model_learning_rate", 1e-4),
            aux_lr=config.get("bottleneck_learning_rate", 1e-3),
            scheduler_step=config.get("scheduler_step_size", 80),
            scheduler_gamma=config.get("scheduler_gamma", 0.1),
            clip=config.get("clip_grad_norm", 1.0),
            steps_per_epoch=steps_per_epoch,
        )
        if use_mesh and config.get("distributed"):
            # Multi-host pod: join the job before building the mesh so
            # jax.devices() spans every host (parallel/mesh.py).
            from ..parallel import distributed_init

            distributed_init()
        mesh = data_parallel_mesh() if use_mesh else None
        self.mesh = mesh
        self.step_fn = make_train_step(
            self.model, self.loss, self.qmap, opt, aux_opt,
            mesh=mesh, space_bits=self.space_bits,
            rate_warmup_steps=int(config.get("rate_warmup_steps", 0)),
            grad_accum=int(config.get("grad_accum", 1)),
        )
        self.start_epoch = self.check_resume()

    # -- checkpointing (flax msgpack; /root/reference/train.py:287-319) --

    def _ckpt_path(self, epoch: int) -> str:
        return os.path.join(self.results_dir, f"ckpt_{epoch:03d}.msgpack")

    def save_checkpoint(self, epoch: int, keep: int = 2):
        blob = serialization.to_bytes({"state": self.state, "epoch": epoch})
        with open(self._ckpt_path(epoch), "wb") as f:
            f.write(blob)
        # Full train-state blobs are ~3x the weights; keep a short tail
        # so long runs don't exhaust scratch disk.
        ckpts = sorted(glob.glob(os.path.join(self.results_dir, "ckpt_*.msgpack")))
        for stale in ckpts[:-keep]:
            os.remove(stale)

    def load_checkpoint(self, path: str) -> int:
        with open(path, "rb") as f:
            blob = f.read()
        target = {"state": self.state, "epoch": 0}
        restored = serialization.from_bytes(target, blob)
        self.state = restored["state"]
        return int(restored["epoch"]) + 1

    def check_resume(self) -> int:
        ckpts = sorted(glob.glob(os.path.join(self.results_dir, "ckpt_*.msgpack")))
        if not ckpts:
            # Warm-start from the durable weights mirror (results/ is
            # scratch and dies with the environment; trained/ is
            # git-tracked). Optimizer state starts fresh — matches the
            # reference's load_state_dict-only resume of a weights file.
            mirror = self.config.get("weights_mirror")
            if mirror and os.path.exists(mirror) and self.config.get("warm_start", True):
                with open(mirror, "rb") as f:
                    params = serialization.from_bytes(self.state.params, f.read())
                self.state = self.state.replace(params=params)
                print(f"warm-started params from {mirror}")
            return 0
        latest = ckpts[-1]
        epoch = self.load_checkpoint(latest)
        print(f"resumed from {latest} (next epoch {epoch})")
        return epoch

    def export_weights(self):
        path = os.path.join(self.results_dir, "weights.msgpack")
        blob = serialization.to_bytes(self.state.params)
        with open(path, "wb") as f:
            f.write(blob)
        # Durable mirror (results/ is scratch space — gitignored); the
        # mirror path survives environment recycles.
        mirror = self.config.get("weights_mirror")
        if mirror:
            os.makedirs(os.path.dirname(mirror) or ".", exist_ok=True)
            with open(mirror, "wb") as f:
                f.write(blob)
        return path

    # -- loops --

    def train_epoch(self, epoch: int):
        """One epoch with a prefetch thread and deferred metric fetches.

        The per-step ``float(metrics[...])`` of the naive loop forces a
        device sync every step (23 ms tunnel RTT + no host/device
        overlap); instead batches are staged on a worker thread and
        metric scalars stay on device, drained with a small lag so at
        most ``lag`` steps are ever in flight.
        """
        import queue as _queue
        import threading

        meter, aux_meter = AverageMeter(), AverageMeter()
        part_meters: dict = {}
        t0 = time.time()

        q: "_queue.Queue" = _queue.Queue(maxsize=4)

        def _producer():
            # Always terminate the queue: a loader/transform crash must
            # re-raise in the consumer, not hang it (ADVICE r4 #1).
            err = None
            try:
                for coords, feats, valid in self.loader:
                    batch = (jnp.asarray(coords), jnp.asarray(feats),
                             jnp.asarray(valid))
                    if self.mesh is not None:
                        batch = shard_batch(self.mesh, batch)
                    q.put(batch)
            except BaseException as e:  # noqa: BLE001 — carried to consumer
                err = e
            finally:
                q.put(err)

        producer = threading.Thread(target=_producer, daemon=True)
        producer.start()

        lag = 8
        pending = []
        while True:
            batch = q.get()
            if batch is None:
                break
            if isinstance(batch, BaseException):
                producer.join()
                raise batch
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, metrics = self.step_fn(self.state, *batch, step_rng)
            pending.append(metrics)

            def _drain(m):
                meter.update(float(m["loss"]))
                aux_meter.update(float(m["aux_loss"]))
                for k, v in m.items():
                    if k in ("loss", "aux_loss"):
                        continue
                    part_meters.setdefault(k, AverageMeter()).update(float(v))

            if len(pending) > lag:
                _drain(pending.pop(0))
        for m in pending:
            _drain(m)
        producer.join()
        dt = time.time() - t0
        parts = " ".join(f"{k}={m.avg:.3f}" for k, m in sorted(part_meters.items()))
        print(f"epoch {epoch}: loss={meter.avg:.4f} aux={aux_meter.avg:.4f} "
              f"({dt:.1f}s) {parts}", flush=True)
        out = {"epoch": epoch, "loss": meter.avg, "aux_loss": aux_meter.avg,
               "time": dt}
        out.update({k: m.avg for k, m in part_meters.items()})
        return out

    def validate(self, epoch: int, val_frames=None,
                 q_points=((0.2, 0.2), (0.2, 0.8), (0.8, 0.2), (0.8, 0.8)),
                 render: bool = True):
        """Validation through the REAL compress->decompress path at a
        2x2 (q_g, q_a) grid, with metrics + renders
        (/root/reference/train.py:223-285)."""
        import pandas as pd

        from ..codec_runtime import PointCloudCodec
        from ..eval.metrics import PointCloudMetric
        from ..eval.render import render_views
        from ..models import Capacities, make_model

        if val_frames is None:
            from ..data.synthetic import surface_cloud

            vc, vcol = surface_cloud(20000, 1024, seed=123)
            val_frames = [{"points": vc, "colors": vcol,
                           "sequence": "synthetic_val", "frame": 0}]
        n_max = max(f["points"].shape[0] for f in val_frames)
        # Bucketed so repeated validations (and heterogeneous frames)
        # reuse the compiled codec.
        caps = Capacities.bucketed(n_max, margin=1.1)
        model = make_model(self.config["model"], caps)
        codec = PointCloudCodec(model, self.state.params)
        codec.update()
        rows = []
        for frame in val_frames:
            coords = frame["points"].astype(np.int32)
            colors = frame["colors"].astype(np.float32)
            for (q_g, q_a) in q_points:
                r = codec.timed_roundtrip(coords, colors, (q_g, q_a))
                rc, rcol = r["reconstruction"]
                m, _ = PointCloudMetric(coords, colors, rc, rcol).compute_pointcloud_metrics()
                rows.append({
                    "epoch": epoch, "sequence": frame.get("sequence", "?"),
                    "q_g": q_g, "q_a": q_a, "bpp": r["bpp"],
                    "sym_y_psnr": m["sym_y_psnr"], "sym_p2p_psnr": m["sym_psnr_mse"],
                    "t_compress": r["t_compress"], "t_decompress": r["t_decompress"],
                })
                if render:
                    render_views(
                        rc, rcol,
                        os.path.join(self.results_dir, "renders",
                                     f"ep{epoch:03d}_{frame.get('sequence','?')}"
                                     f"_g{q_g}_a{q_a}_{{}}.png"),
                        views=("front",),
                    )
        df = pd.DataFrame(rows)
        path = os.path.join(self.results_dir, "val.csv")
        df.to_csv(path, mode="a", header=not os.path.exists(path))
        return df

    def train(self, val_every: int = 10, val_fn=None, val_frames=None):
        history = []
        for epoch in range(self.start_epoch, self.epochs):
            history.append(self.train_epoch(epoch))
            self.save_checkpoint(epoch)
            # Per-epoch weight export: a crash/kill mid-run still leaves
            # the latest usable weights behind (plus the mirror copy).
            self.export_weights()
            if (epoch + 1) % val_every == 0:
                if val_fn is not None:
                    val_fn(self.model, self.state.params, epoch)
                elif self.config.get("validate", False):
                    self.validate(epoch, val_frames)
        self.export_weights()
        return history
