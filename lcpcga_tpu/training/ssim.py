"""Sparse windowed SSIM color loss.

Re-design of /root/reference/loss.py:197-453 (ColorSSIM): SSIM over a
3D Gaussian window evaluated on the union of GT and predicted
coordinates. The reference packs 30 feature channels (occupancies,
colors, squares, masked products) into one ME channelwise convolution;
here the windowed weighted sums are a single kernel-map gather-reduce
over the union coordinate set (scan over taps, O(window^3) gathers).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import SparseTensor, features_at, kernel_map, union_coords
from ..ops import coords as C


def gaussian_window_3d(window_size: int, sigma: float = 1.5) -> np.ndarray:
    """Normalized 3D Gaussian weights, one per window tap (tap order =
    lexicographic offsets, matching window_offsets)."""
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    w3 = g[:, None, None] * g[None, :, None] * g[None, None, :]
    return w3.reshape(-1)


def window_offsets(window_size: int, stride: int) -> jnp.ndarray:
    r = np.arange(window_size) - window_size // 2
    offs = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    return jnp.asarray(offs * stride, jnp.int32)


def rgb_to_yuv(rgb: jax.Array) -> jax.Array:
    m = jnp.array(
        [[0.2126, 0.7152, 0.00722],
         [-0.1146, -0.3854, 0.5],
         [0.5, -0.4542, 0.0458]],
        rgb.dtype,
    )
    yuv = jnp.einsum("ij,...j->...i", m, rgb)
    return yuv.at[..., 1:].add(0.5)


def windowed_sums(feats: jax.Array, nbr: jax.Array, weights: jax.Array) -> jax.Array:
    """Gaussian-weighted window sums: feats [B,N,C], nbr [B,M,K] -> [B,M,C]."""
    B, M, K = nbr.shape
    Cdim = feats.shape[-1]
    pad = jnp.concatenate([feats, jnp.zeros_like(feats[:, :1])], axis=1)

    def body(acc, k):
        idx = jax.lax.dynamic_index_in_dim(nbr, k, axis=2, keepdims=False)
        g = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(pad, idx)
        return acc + g * weights[k], None

    init = jnp.zeros((B, M, Cdim), feats.dtype)
    out, _ = jax.lax.scan(body, init, jnp.arange(K))
    return out


class ColorSSIM:
    def __init__(self, config: Dict[str, Any]):
        self.identifier = config["id"]
        self.window_size = config.get("window_size", 5)
        self.yuv = config.get("yuv", False)
        self.c1 = 0.01**2
        self.c2 = 0.03**2
        self.c3 = self.c2 / 2
        self.weights = jnp.asarray(gaussian_window_3d(self.window_size), jnp.float32)

    def __call__(self, gt: SparseTensor, pred: Dict[str, Any]) -> jax.Array:
        prediction: SparseTensor = pred["prediction"]
        lam: SparseTensor = pred["q_map"]

        union = union_coords(gt, prediction, gt.capacity + prediction.capacity)
        offs = window_offsets(self.window_size, union.stride)
        nbr = kernel_map(union, union.keys, offs)

        gt_colors = features_at(gt, union.keys)
        pr_colors = features_at(prediction, union.keys)
        if self.yuv:
            gt_colors = rgb_to_yuv(gt_colors)
            pr_colors = rgb_to_yuv(pr_colors)
        from ..ops import contains

        gt_occ = contains(gt, union.keys).astype(jnp.float32)[..., None]
        pr_occ = contains(prediction, union.keys).astype(jnp.float32)[..., None]
        both = gt_occ * pr_occ

        x = gt_colors * gt_occ
        y = pr_colors * pr_occ
        xm = x * both
        ym = y * both

        stacked = jnp.concatenate(
            [gt_occ, pr_occ, both, x, y, x * x, y * y, xm, ym, xm * xm, ym * ym, xm * ym],
            axis=-1,
        )
        sums = windowed_sums(stacked, nbr, self.weights)

        def col(i, n=3):
            return sums[..., i : i + n]

        n_x, n_y, n_xy = sums[..., 0:1], sums[..., 1:2], sums[..., 2:3]
        s_x, s_y = col(3), col(6)
        s_xx, s_yy = col(9), col(12)
        m_x, m_y = col(15), col(18)
        m_xx, m_yy = col(21), col(24)
        m_xy = col(27)

        inv = lambda n: jnp.where(n > 0, 1.0 / jnp.maximum(n, 1e-12), 0.0)
        n_x_i, n_y_i, n_xy_i = inv(n_x), inv(n_y), inv(n_xy)

        mu_x, mu_y = n_x_i * s_x, n_y_i * s_y
        mu_xm, mu_ym = n_xy_i * m_x, n_xy_i * m_y

        var = lambda ninv, sq, mu: jnp.maximum(ninv * sq - mu * mu, 0.0)
        var_x = var(n_x_i, s_xx, mu_x)
        var_y = var(n_y_i, s_yy, mu_y)
        var_xm = var(n_xy_i, m_xx, mu_xm)
        var_ym = var(n_xy_i, m_yy, mu_ym)
        cov = n_xy_i * m_xy - mu_xm * mu_ym

        luminance = (2 * mu_x * mu_y + self.c1) / (mu_x**2 + mu_y**2 + self.c1)
        contrast = (2 * jnp.sqrt(var_x) * jnp.sqrt(var_y) + self.c2) / (var_x + var_y + self.c2)
        structure = (cov + self.c3) / (jnp.sqrt(var_xm) * jnp.sqrt(var_ym) + self.c3)
        s = luminance * contrast * structure

        loss = (1.0 - s) / 2.0
        w = features_at(lam, union.keys)[..., 1:2]
        loss = loss * w
        if self.yuv:
            loss = loss * jnp.array([[0.75, 0.125, 0.125]], loss.dtype)
        mask = union.valid[..., None].astype(loss.dtype)
        denom = jnp.maximum(jnp.sum(mask) * loss.shape[-1], 1.0)
        return jnp.sum(loss * mask) / denom
