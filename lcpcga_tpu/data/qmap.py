"""Quality-map generator: random per-item Q maps + λ-map scaling.

TPU-native re-design of /root/reference/data/q_map.py:143-266. The
per-batch Python loop becomes a vmapped random draw; everything runs
inside jit with explicit PRNG keys.

Modes (λ scaling, /root/reference/data/q_map.py:188-205):
  exponential: λ = 2^(q * log2(λmax + λmin)) + λmin - 1
  quadratic:   λ = q² * (λmax - λmin) + λmin
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import SparseTensor


class QMap:
    def __init__(self, config):
        self.mode = config.get("mode", "quadratic")
        la_min, la_max = config.get("lambda_A_min", 0.0), config.get("lambda_A_max", 6400.0)
        lg_min, lg_max = config.get("lambda_G_min", 0.0), config.get("lambda_G_max", 200.0)
        if self.mode == "exponential":
            self.a = (math.log2(lg_max + lg_min), math.log2(la_max + la_min))
            self.b = (lg_min - 1.0, la_min - 1.0)
        elif self.mode == "quadratic":
            self.a = (lg_max - lg_min, la_max - la_min)
            self.b = (lg_min, la_min)
        else:
            raise ValueError(f"unknown q_map mode {self.mode!r}")

    def scale(self, q: jax.Array) -> jax.Array:
        """q [..., 2] in [0,1] -> λ [..., 2] ([λ_G, λ_A])."""
        a = jnp.asarray(self.a, q.dtype)
        b = jnp.asarray(self.b, q.dtype)
        if self.mode == "exponential":
            return 2.0 ** (q * a) + b
        return q * q * a + b

    def __call__(self, geometry: SparseTensor, key: jax.Array) -> Tuple[SparseTensor, SparseTensor]:
        """Random training Q-map + λ-map on the input coordinates.

        Per item: 50% axis gradient / 50% uniform random level
        (/root/reference/data/q_map.py:208-266).
        """
        coords = geometry.coords.astype(jnp.float32)
        valid = geometry.valid

        def per_item(key, c, v):
            k_choice, k_axis, k_uni = jax.random.split(key, 3)
            axis = jax.random.randint(k_axis, (), 0, 3)
            col = jnp.take(c, axis, axis=-1)
            big = jnp.asarray(jnp.finfo(jnp.float32).max)
            cmin = jnp.min(jnp.where(v, col, big))
            cmax = jnp.max(jnp.where(v, col, -big))
            grad = jnp.clip((col - cmin) / (cmax - cmin + 1e-10), 0.0, 1.0)
            grad2 = jnp.stack([grad, grad], axis=-1)
            uni = jnp.broadcast_to(jax.random.uniform(k_uni, (2,)), grad2.shape)
            q = jnp.where(jax.random.bernoulli(k_choice), grad2, uni)
            return jnp.where(v[..., None], q, 0.0)

        keys = jax.random.split(key, geometry.batch_size)
        qf = jax.vmap(per_item)(keys, coords, valid)
        lam = jnp.where(valid[..., None], self.scale(qf), 0.0)
        q_st = geometry.with_feats(qf)
        lam_st = geometry.with_feats(lam)
        return q_st, lam_st

    def uniform(self, geometry: SparseTensor, q_g: float, q_a: float) -> SparseTensor:
        """Spatially uniform evaluation Q-map (/root/reference/utils.py:436-445)."""
        qf = jnp.stack(
            [
                jnp.full(geometry.keys.shape, q_g, jnp.float32),
                jnp.full(geometry.keys.shape, q_a, jnp.float32),
            ],
            axis=-1,
        )
        qf = jnp.where(geometry.valid[..., None], qf, 0.0)
        return geometry.with_feats(qf)
