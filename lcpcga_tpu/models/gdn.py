"""Generalized divisive normalization for sparse features.

Parity component for /root/reference/model/blocks.py:258-282
(MinkowskiGDN, the |x| variant of CompressAI's GDN). NOTE: the
reference constructs it inside ScaledBlock but never calls it in the
shipped forward path (SURVEY.md #5/#8 — dead in the default model);
it is provided here as a standalone layer for ablations.

y_i = x_i / (beta_i + sum_j gamma_ij * |x_j|)  (inverse: multiply)
with non-negativity enforced through a squared reparameterization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 2**-18


class GDN(nn.Module):
    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        """feats: [..., C] -> normalized [..., C] (batch-free op: sparse
        rows are independent, so no per-batch loop is needed, unlike
        /root/reference/model/blocks.py:269-281)."""
        c = self.channels
        beta_param = self.param(
            "beta", lambda k, s: jnp.sqrt(jnp.ones(s) + _EPS), (c,)
        )
        gamma_param = self.param(
            "gamma",
            lambda k, s: jnp.sqrt(jnp.eye(c) * self.gamma_init + _EPS).reshape(s),
            (c, c),
        )
        beta = jnp.square(beta_param) - _EPS + self.beta_min
        gamma = jnp.square(gamma_param) - _EPS
        norm = jnp.einsum("ij,...j->...i", gamma, jnp.abs(feats)) + beta
        return feats * norm if self.inverse else feats / norm
