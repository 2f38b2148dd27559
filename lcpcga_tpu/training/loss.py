"""Loss system: registry wrapper + BPP / color / multiscale focal / SSIM.

TPU-native re-design of /root/reference/loss.py. All reductions are
mask-aware (padding rows contribute nothing); the per-batch Python
loops and packed-int ``isin`` of the reference become key lookups on
the canonical sparse tensors.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops import (
    SparseTensor,
    avg_pool,
    avg_pool_at,
    contains,
    downsample_map,
    features_at,
    kernel_map,
)
from ..ops import coords as C


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(x * mask) / denom


class BPPLoss:
    """Rate term: -sum(log2 likelihood) / num_input_points
    (/root/reference/loss.py:67-85). Padded rows carry likelihood 1."""

    def __init__(self, config):
        self.weight = config.get("weight", 1.0)
        self.identifier = config["id"]
        self.key = config["key"]

    def __call__(self, gt: SparseTensor, pred: Dict[str, Any]) -> jax.Array:
        liks = pred["likelihoods"][self.key]
        if not isinstance(liks, (list, tuple)):
            liks = [liks]
        num_points = jnp.maximum(jnp.sum(gt.count), 1).astype(liks[0].dtype)
        bits = 0.0
        for lik in liks:
            bits = bits + jnp.sum(jnp.log(lik)) / (-math.log(2) * num_points)
        # rate_scale: training-schedule multiplier (rate warm-up). The
        # round-4 run collapsed the y latent to ~0 before the synthesis
        # learned to use it — distortion-first training escapes that
        # local optimum; the trainer ramps this 0 -> 1 over
        # config.rate_warmup_steps (absent at eval => 1).
        return bits * self.weight * pred.get("rate_scale", 1.0)


class ColorLoss:
    """L1/L2 on colors gathered at GT coordinates, weighted per point by
    λ_A (/root/reference/loss.py:88-109)."""

    def __init__(self, config):
        self.identifier = config["id"]
        self.l1 = config.get("loss", "L2") == "L1"

    def __call__(self, gt: SparseTensor, pred: Dict[str, Any]) -> jax.Array:
        prediction: SparseTensor = pred["prediction"]
        lam: SparseTensor = pred["q_map"]
        pred_colors = features_at(prediction, gt.keys)
        err = gt.feats - pred_colors
        err = jnp.abs(err) if self.l1 else err * err
        w = lam.feats[..., 1:2]  # λ_A channel; λ-map is row-aligned with gt
        mask = gt.valid[..., None].astype(err.dtype)
        return _masked_mean(err * w, jnp.broadcast_to(mask, err.shape))


class MultiscaleFocalLoss:
    """Focal loss on occupancy logits at every upsampling scale, weighted
    by a 3^3-average-pooled λ_G map (/root/reference/loss.py:147-195).

    Consumes coarse->fine lists [stride4, stride2, stride1] from the
    synthesis transform and walks fine->coarse, downsampling the λ-map
    between scales exactly like the reference's MinkowskiAvgPooling
    cascade (/root/reference/loss.py:190-193).
    """

    def __init__(self, config):
        self.identifier = config["id"]
        self.alpha = config.get("alpha", 0.5)
        self.gamma = config.get("gamma", 2.0)
        # Optional boost (default 1.0 = reference semantics). The color
        # term (λ_A ≤ 6400) outweighs the geometry term (λ_G ≤ 200) by
        # ~30x on shared features, but color loss at uncovered GT
        # points contributes ZERO gradient (features_at misses), so
        # color fidelity is gated on occupancy coverage converging
        # first — a geometry-first weight accelerates that (round-5
        # training schedule; see STATUS.md).
        self.weight = config.get("weight", 1.0)

    def __call__(self, gt: SparseTensor, pred: Dict[str, Any]) -> jax.Array:
        predictions = pred["occ_predictions"]  # [occ4, occ2, occ1]
        points = pred["points"]  # [gt4, gt2, gt1]
        lam: SparseTensor = pred["q_map"]

        loss = 0.0
        # fine -> coarse
        for occ, gt_scale in zip(reversed(predictions), reversed(points)):
            overlap = contains(gt_scale, occ.keys)
            p = jax.nn.sigmoid(occ.feats[..., 0])
            pt = jnp.where(overlap, p, 1.0 - p)
            alpha = jnp.where(overlap, self.alpha, 1.0 - self.alpha)
            pt = jnp.clip(pt, 1e-2, 1.0)
            focal = -alpha * (1.0 - pt) ** self.gamma * jnp.log(pt)

            # λ_G averaged over the 3^3 window around each candidate
            # (dense-volume box filter on small coordinate spaces).
            q_at = avg_pool_at(lam, occ)
            w = q_at.feats[..., 0]

            mask = occ.valid.astype(focal.dtype)
            loss = loss + _masked_mean(focal * w, mask)

            # Downsample λ-map for the next (coarser) scale.
            lam_out, lam_nbr = downsample_map(lam, lam.capacity)
            lam = avg_pool(lam, lam_out, lam_nbr)
        return loss * self.weight


class FocalLoss:
    """Legacy single-scale focal loss (/root/reference/loss.py:112-145)."""

    def __init__(self, config):
        self.identifier = config["id"]
        self.alpha = config.get("alpha", 0.5)
        self.gamma = config.get("gamma", 2.0)

    def __call__(self, gt: SparseTensor, pred: Dict[str, Any]) -> jax.Array:
        prediction: SparseTensor = pred["prediction"]
        overlap = contains(gt, prediction.keys)
        p = jax.nn.sigmoid(prediction.feats[..., 0] + 0.5)
        pt = jnp.where(overlap, p, 1.0 - p)
        alpha = jnp.where(overlap, self.alpha, 1.0 - self.alpha)
        pt = jnp.clip(pt, 1e-2, 1.0)
        focal = -alpha * (1.0 - pt) ** self.gamma * jnp.log(pt)
        return _masked_mean(focal, prediction.valid.astype(focal.dtype))


_REGISTRY = {
    "BPPLoss": BPPLoss,
    "ColorLoss": ColorLoss,
    "Multiscale_FocalLoss": MultiscaleFocalLoss,
    "FocalLoss": FocalLoss,
}


class Loss:
    """Config-driven sum of losses (/root/reference/loss.py:7-65).

    ``ColorSSIM`` is registered lazily from training/ssim.py.
    """

    def __init__(self, config: Dict[str, Dict]):
        self.losses = {}
        for ident, setting in config.items():
            setting = dict(setting)
            setting["id"] = ident
            key = setting["type"]
            if key == "ColorSSIM":
                from .ssim import ColorSSIM

                self.losses[ident] = ColorSSIM(setting)
                continue
            if key not in _REGISTRY:
                raise ValueError(f"unknown loss type {key!r}")
            self.losses[ident] = _REGISTRY[key](setting)

    def __call__(self, gt: SparseTensor, pred: Dict[str, Any]):
        total = 0.0
        parts = {}
        for ident, loss in self.losses.items():
            val = loss(gt, pred)
            parts[ident] = val
            total = total + val
        return total, parts
