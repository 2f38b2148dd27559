"""Entropy models: factorized prior, conditional Gaussian, hyperprior.

JAX reimplementation of the CompressAI entropy-model math the reference
depends on (/root/reference/model/entropy_models.py:104-414 wires ME
sparse heads around CompressAI's ``EntropyBottleneck`` /
``GaussianConditional``; SURVEY.md §2.2). Everything likelihood-related
is jit-able on TPU; the rANS bitstream coder itself is host-side C++
(lcpcga_tpu/coding).

Key contracts carried over:

  * EntropyBottleneck = univariate learned density per channel (Ballé
    et al. 2018 appendix 6.1): a monotone MLP parameterizes the CDF;
    ``quantiles`` are trained by a separate aux optimizer
    (/root/reference/train.py:63-74 splits parameters on ``.quantiles``).
  * GaussianConditional = mean-scale Gaussian with a 64-entry log-spaced
    scale table; scales are lower-bounded at 0.11.
  * ``update()`` bakes quantized 16-bit CDF tables for the coder; it
    must be called before any compress (/root/reference/model/model.py:30-36).
  * The hyper synthesis/Q heads evaluate on the *deterministic* latent
    pyramid derived from y's coordinates, so encoder and decoder agree
    by construction (the reference enforces this with coordinate-sorted
    conv wrappers, /root/reference/model/entropy_models.py:12-102).

Padding rows (invalid coordinates) always get likelihood 1 — zero bits.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import (
    SparseConv,
    SparseTensor,
    downsample_map,
    self_kernel_map,
)
from .layers import UpsampleTo

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def default_scale_table() -> np.ndarray:
    return np.exp(np.linspace(np.log(SCALES_MIN), np.log(SCALES_MAX), SCALES_LEVELS))


# ---------------------------------------------------------------------------
# Lower bound with pass-through-when-decreasing gradient
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound(x, bound: float):
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), x


def _lb_bwd(bound, x, g):
    # Gradient passes when above the bound, or when it would push the
    # value back up toward the bound.
    keep = (x >= bound) | (g < 0)
    return (jnp.where(keep, g, 0.0),)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


def _std_gaussian_cdf(x):
    return 0.5 * jax.scipy.special.erfc(-x / jnp.sqrt(2.0).astype(x.dtype))


# ---------------------------------------------------------------------------
# Codec tables (host-side product of update())
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CodecTables:
    """Quantized CDF tables consumed by the rANS coder.

    cdfs: int32 [num_ctx, max_len] — per context: 0, cumfreqs..., then
          padding; cdfs[i][L_i - 1] == 1 << 16. The last real symbol of
          each context is the overflow/bypass escape symbol.
    lengths: int32 [num_ctx] — used entries per row.
    offsets: int32 [num_ctx] — value of symbol 0 (value = symbol + offset).
    """

    cdfs: np.ndarray
    lengths: np.ndarray
    offsets: np.ndarray


def pmf_to_quantized_cdf(pmf: np.ndarray, tail_mass: float, precision: int = 16) -> np.ndarray:
    """Quantize a pmf (plus an overflow symbol of ``tail_mass``) to a
    16-bit CDF, guaranteeing every symbol has nonzero frequency."""
    pmf = np.clip(np.asarray(pmf, np.float64), 0.0, None)
    p = np.concatenate([pmf, [max(tail_mass, 1e-10)]])
    p = p / p.sum()
    total = 1 << precision
    freq = np.maximum(1, np.round(p * total).astype(np.int64))
    # Re-balance so the total is exactly 2**precision: steal from the
    # largest entries (they lose the least in relative terms).
    excess = int(freq.sum()) - total
    while excess != 0:
        idx = int(np.argmax(freq)) if excess > 0 else int(np.argmin(freq))
        step = 1 if excess > 0 else -1
        if excess > 0 and freq[idx] <= 1:
            raise ValueError("cannot quantize pmf to requested precision")
        freq[idx] -= step
        excess -= step
    cdf = np.zeros(len(freq) + 1, np.int32)
    cdf[1:] = np.cumsum(freq)
    return cdf


def build_tables(pmfs: np.ndarray, lengths: np.ndarray, offsets: np.ndarray,
                 tail_masses: Optional[np.ndarray] = None) -> CodecTables:
    """pmfs: [num_ctx, max_pmf_len] float; lengths: per-ctx pmf length."""
    num = pmfs.shape[0]
    max_cdf_len = int(lengths.max()) + 2
    cdfs = np.zeros((num, max_cdf_len), np.int32)
    out_len = np.zeros(num, np.int32)
    for i in range(num):
        L = int(lengths[i])
        tm = float(tail_masses[i]) if tail_masses is not None else TAIL_MASS
        cdf = pmf_to_quantized_cdf(pmfs[i, :L], tm)
        cdfs[i, : len(cdf)] = cdf
        out_len[i] = len(cdf)
    return CodecTables(cdfs=cdfs, lengths=out_len, offsets=np.asarray(offsets, np.int32))


# ---------------------------------------------------------------------------
# EntropyBottleneck — learned factorized prior
# ---------------------------------------------------------------------------


class EntropyBottleneck(nn.Module):
    """Per-channel univariate learned density (Ballé 2018 app. 6.1).

    A K-layer monotone network parameterizes the cumulative c(x); the
    discrete likelihood of an integer-quantized value is
    c(x + .5) - c(x - .5). Channel-independent: parameters have a
    leading channel axis and the op is a batched tiny matmul chain.
    """

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0

    def setup(self):
        dims = (1,) + self.filters + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        matrices = []
        biases = []
        factors = []
        for l in range(len(dims) - 1):
            d_in, d_out = dims[l], dims[l + 1]
            init_m = float(np.log(np.expm1(1.0 / scale / d_out)))
            matrices.append(
                self.param(
                    f"matrix_{l}",
                    lambda key, shape, v=init_m: jnp.full(shape, v, jnp.float32),
                    (self.channels, d_out, d_in),
                )
            )
            biases.append(
                self.param(
                    f"bias_{l}",
                    lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.5, 0.5),
                    (self.channels, d_out, 1),
                )
            )
            if l < len(dims) - 2:
                factors.append(
                    self.param(
                        f"factor_{l}",
                        nn.initializers.zeros,
                        (self.channels, d_out, 1),
                    )
                )
        self.matrices = matrices
        self.biases = biases
        self.factors = factors
        self.quantiles = self.param(
            "quantiles",
            lambda key, shape: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale], jnp.float32),
                (shape[0], 1, 1),
            ),
            (self.channels, 1, 3),
        )

    def _logits_cumulative(self, x: jax.Array, stop_params: bool = False) -> jax.Array:
        """x: [C, 1, M] -> logits [C, 1, M]."""
        v = x
        n_layers = len(self.matrices)
        for l in range(n_layers):
            m, b = self.matrices[l], self.biases[l]
            if stop_params:
                m, b = jax.lax.stop_gradient(m), jax.lax.stop_gradient(b)
            v = jnp.einsum("coi,cim->com", jax.nn.softplus(m), v) + b
            if l < n_layers - 1:
                a = self.factors[l]
                if stop_params:
                    a = jax.lax.stop_gradient(a)
                v = v + jnp.tanh(a) * jnp.tanh(v)
        return v

    def likelihood(self, x: jax.Array) -> jax.Array:
        """x: [..., C] values -> discrete likelihoods [..., C]."""
        shape = x.shape
        flat = jnp.moveaxis(x.reshape(-1, shape[-1]), 0, 1)[:, None, :]  # [C,1,M]
        upper = self._logits_cumulative(flat + 0.5)
        lower = self._logits_cumulative(flat - 0.5)
        # Stable difference of sigmoids: evaluate on the side with
        # negative logits.
        sign = jax.lax.stop_gradient(-jnp.sign(upper + lower))
        lik = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        lik = jnp.moveaxis(lik[:, 0, :], 0, 1).reshape(shape)
        return lower_bound(lik, LIKELIHOOD_BOUND)

    def medians(self) -> jax.Array:
        return self.quantiles[:, 0, 1]

    def __call__(self, x: jax.Array, training: bool, noise_key: Optional[jax.Array] = None):
        """x: [..., C] -> (x_hat, likelihoods)."""
        if training:
            noise = jax.random.uniform(noise_key, x.shape, x.dtype, -0.5, 0.5)
            x_hat = x + noise
        else:
            med = jax.lax.stop_gradient(self.medians())
            x_hat = jnp.round(x - med) + med
        return x_hat, self.likelihood(x_hat)

    def aux_loss(self) -> jax.Array:
        """Drives quantiles to the tail-mass points of each channel's
        density (the ``.quantiles``-only optimizer,
        /root/reference/train.py:63-74 convention)."""
        logits = self._logits_cumulative(self.quantiles, stop_params=True)
        t = float(np.log(2.0 / TAIL_MASS - 1.0))
        targets = jnp.array([-t, 0.0, t], jnp.float32)
        return jnp.sum(jnp.abs(logits - targets))

    def quantize_symbols(self, x: jax.Array):
        """Integer coded values round(x - median) and the dequantized
        reconstruction. Values outside the CDF support are handled by
        the coder's bypass/escape mechanism, so no clipping here — the
        decoder reconstructs the exact same integers."""
        med = self.medians()
        v = jnp.round(x - med)
        return v.astype(jnp.int32), v + med

    # ---- update(): bake CDF tables ----

    # Static half-window for the jitted density evaluation: one device
    # call computes the pmf over [median-K, median+K] for every channel;
    # the host slices each channel's true [minima, maxima] support out.
    # (Eager per-op evaluation over the TPU tunnel costs seconds per op —
    # update() must be a single compiled call.)
    TABLE_HALF_WINDOW = 256

    def pmf_window(self):
        """Jit-able: (pmf [C, 2K+1], cdf_lower [C, 2K+1]) around medians."""
        K = self.TABLE_HALF_WINDOW
        med = self.medians()
        offs = jnp.arange(-K, K + 1, dtype=jnp.float32)
        samples = (med[:, None] + offs[None, :])[:, None, :]  # [C,1,L]
        upper = self._logits_cumulative(samples + 0.5)
        lower = self._logits_cumulative(samples - 0.5)
        sign = -jnp.sign(upper + lower)
        pmf = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return pmf[:, 0, :], jax.nn.sigmoid(lower[:, 0, :]), jax.nn.sigmoid(-upper[:, 0, :])

    @classmethod
    def tables_from_window(cls, quantiles, pmf, cdf_lo, cdf_hi) -> CodecTables:
        """Host-side: slice per-channel supports and quantize CDFs."""
        K = cls.TABLE_HALF_WINDOW
        q = np.asarray(quantiles)[:, 0, :]
        med = q[:, 1]
        lo_span = np.ceil(med - q[:, 0]).astype(np.int32)
        hi_span = np.ceil(q[:, 2] - med).astype(np.int32)
        clipped = (lo_span > K) | (hi_span > K)
        if clipped.any():
            # Tails beyond the window bypass-code (a rate hit, never
            # corruption) — but training drifting here silently would
            # inflate bpp, so say so (VERDICT r1 weak #8).
            import warnings

            warnings.warn(
                f"EntropyBottleneck: {int(clipped.sum())} channel(s) have "
                f"learned support wider than the ±{K} CDF window "
                f"(max span {int(max(lo_span.max(), hi_span.max()))}); "
                "out-of-window symbols fall back to bypass coding"
            )
        minima = np.clip(lo_span, 0, K)
        maxima = np.clip(hi_span, 0, K)
        lengths = minima + maxima + 1
        max_len = int(lengths.max())
        C_ = len(med)
        pmf = np.asarray(pmf)
        out = np.zeros((C_, max_len), np.float64)
        tails = np.zeros(C_, np.float64)
        for c in range(C_):
            lo, hi = K - minima[c], K + maxima[c] + 1
            out[c, : lengths[c]] = pmf[c, lo:hi]
            tails[c] = float(cdf_lo[c, lo]) + float(cdf_hi[c, hi - 1])
        return build_tables(out, lengths, -minima, tails)


# ---------------------------------------------------------------------------
# GaussianConditional
# ---------------------------------------------------------------------------


class GaussianConditional(nn.Module):
    """Mean-scale Gaussian entropy model with a quantized scale table."""

    @nn.compact
    def __call__(self, *args, **kwargs):  # pragma: no cover - not used as module
        raise NotImplementedError

    @staticmethod
    def likelihood(x: jax.Array, scales: jax.Array, means: jax.Array) -> jax.Array:
        s = lower_bound(scales, SCALES_MIN)
        v = jnp.abs(x - means)
        upper = _std_gaussian_cdf((0.5 - v) / s)
        lower = _std_gaussian_cdf((-0.5 - v) / s)
        return lower_bound(upper - lower, LIKELIHOOD_BOUND)

    @staticmethod
    def quantize(x, means, training: bool, noise_key=None):
        if training:
            return x + jax.random.uniform(noise_key, x.shape, x.dtype, -0.5, 0.5)
        return jnp.round(x - means) + means

    @staticmethod
    def build_indexes(scales: jax.Array, scale_table: np.ndarray) -> jax.Array:
        """Smallest table index whose scale covers the given scale."""
        table = jnp.asarray(scale_table, jnp.float32)
        s = lower_bound(scales, SCALES_MIN)
        return jnp.searchsorted(table, s, side="left").clip(0, len(scale_table) - 1).astype(jnp.int32)

    @staticmethod
    def build_codec_tables(scale_table: np.ndarray) -> CodecTables:
        """Per-table-scale quantized CDFs over a +-tail support."""
        from scipy.stats import norm

        multiplier = -norm.ppf(TAIL_MASS / 2)
        centers = np.ceil(np.asarray(scale_table) * multiplier).astype(np.int32)
        lengths = 2 * centers + 1
        max_len = int(lengths.max())
        pmfs = np.zeros((len(scale_table), max_len), np.float64)
        for i, (s, c) in enumerate(zip(scale_table, centers)):
            xs = np.arange(-c, c + 1)
            up = norm.cdf((xs + 0.5) / s)
            lo = norm.cdf((xs - 0.5) / s)
            pmfs[i, : 2 * c + 1] = up - lo
        return build_tables(pmfs, lengths, -centers)


# ---------------------------------------------------------------------------
# Hyperprior over the sparse latent pyramid
# ---------------------------------------------------------------------------


class MeanScaleHyperprior(nn.Module):
    """Mean-scale hyperprior with optional quality-map decode head (h_q).

    Sparse heads mirror /root/reference/model/entropy_models.py:253-414:
    h_a downsamples y (stride 8) to z (stride 32); h_s regrows Gaussian
    (scale, mean) parameters; h_q regrows the 2-channel quality map so Q
    rides in z for free. All heads evaluate on the deterministic pyramid
    {z coords, stride-16 coords, y coords}, reproducible by the decoder
    from y's coordinates alone (/root/reference/model/model.py:188-191).
    """

    caps: "object"  # Capacities
    c_bottleneck: int = 128
    c_hyper: int = 128
    c_q: int = 2
    use_q_head: bool = True

    def setup(self):
        ch, cb = self.c_hyper, self.c_bottleneck
        self.eb = EntropyBottleneck(channels=ch)
        # h_a
        self.ha_conv0 = SparseConv(ch)
        self.ha_conv1 = SparseConv(ch)
        self.ha_conv2 = SparseConv(ch)
        self.ha_down1 = SparseConv(ch)
        self.ha_down2 = SparseConv(ch)
        # h_s
        self.hs_conv0 = SparseConv(ch)
        self.hs_up1 = UpsampleTo(ch, kernel_size=2)
        self.hs_conv1 = SparseConv(ch)
        self.hs_up2 = UpsampleTo(cb * 3 // 2, kernel_size=2)
        self.hs_conv2 = SparseConv(cb * 2)
        # h_q
        if self.use_q_head:
            self.hq_conv0 = SparseConv(ch)
            self.hq_up1 = UpsampleTo(ch, kernel_size=3)
            self.hq_conv1 = SparseConv(ch)
            self.hq_up2 = UpsampleTo(ch, kernel_size=3)
            self.hq_conv2 = SparseConv(self.c_q)

    def pyramid(self, y: SparseTensor):
        """Deterministic coordinate pyramid below y: stride 16 and 32."""
        c16_st, d16_nbr = downsample_map(y, self.caps.cap(16))
        c32_st, d32_nbr = downsample_map(c16_st, self.caps.cap(32))
        return c16_st, d16_nbr, c32_st, d32_nbr

    def hyper_analysis(self, y: SparseTensor, nbr8, c16_st, d16_nbr, c32_st, d32_nbr):
        h = self.ha_conv0(y, y, nbr8)
        h = h.with_feats(nn.leaky_relu(h.feats, 0.01))
        h = self.ha_down1(h, c16_st, d16_nbr)
        nbr16 = self_kernel_map(c16_st)
        h = self.ha_conv1(h, h, nbr16)
        h = h.with_feats(nn.leaky_relu(h.feats, 0.01))
        h = self.ha_down2(h, c32_st, d32_nbr)
        nbr32 = self_kernel_map(c32_st)
        z = self.ha_conv2(h, h, nbr32)
        return z, nbr16, nbr32

    def hyper_synthesis(self, z_hat: SparseTensor, nbr16, nbr32, c16_st, y: SparseTensor, nbr8):
        h = self.hs_conv0(z_hat, z_hat, nbr32)
        h = self.hs_up1(h, c16_st)
        h = h.with_feats(nn.leaky_relu(h.feats, 0.01))
        h = self.hs_conv1(h, h, nbr16)
        h = self.hs_up2(h, y)
        h = h.with_feats(nn.leaky_relu(h.feats, 0.01))
        params = self.hs_conv2(h, h, nbr8)
        scales, means = jnp.split(params.feats, 2, axis=-1)
        return scales, means

    def q_synthesis(self, z_hat: SparseTensor, nbr16, nbr32, c16_st, y: SparseTensor, nbr8):
        h = self.hq_conv0(z_hat, z_hat, nbr32)
        h = self.hq_up1(h, c16_st)
        h = h.with_feats(nn.relu(h.feats))
        h = self.hq_conv1(h, h, nbr16)
        h = self.hq_up2(h, y)
        h = h.with_feats(nn.relu(h.feats))
        q = self.hq_conv2(h, h, nbr8)
        return q

    def __call__(self, y: SparseTensor, training: bool = False):
        nbr8 = self_kernel_map(y)
        c16_st, d16_nbr, c32_st, d32_nbr = self.pyramid(y)
        z, nbr16, nbr32 = self.hyper_analysis(y, nbr8, c16_st, d16_nbr, c32_st, d32_nbr)

        noise_z = self.make_rng("noise") if training else None
        z_hat_f, z_lik = self.eb(z.feats, training, noise_z)
        z_lik = jnp.where(z.valid[..., None], z_lik, 1.0)
        z_hat = z.with_feats(z_hat_f)

        scales, means = self.hyper_synthesis(z_hat, nbr16, nbr32, c16_st, y, nbr8)
        q_hat = (
            self.q_synthesis(z_hat, nbr16, nbr32, c16_st, y, nbr8)
            if self.use_q_head
            else None
        )

        noise_y = self.make_rng("noise") if training else None
        y_hat_f = GaussianConditional.quantize(y.feats, means, training, noise_y)
        y_lik = GaussianConditional.likelihood(y_hat_f, scales, means)
        y_lik = jnp.where(y.valid[..., None], y_lik, 1.0)
        y_hat = y.with_feats(y_hat_f)

        return y_hat, q_hat, (y_lik, z_lik)

    def aux_loss(self):
        return self.eb.aux_loss()

    # ---- codec-path pieces (called under jit from the codec runtime;
    # the rANS coder itself runs on host) ----
    #
    # Bit-exactness design: the encoder simulates the decoder by calling
    # the SAME jitted ``decode_params`` program on the same inputs
    # (y coordinates + integer-reconstructed ẑ), so Gaussian parameters
    # and rANS contexts agree exactly — the reference achieves this by
    # re-running h_s on the encoder (/root/reference/model/
    # entropy_models.py:352-364) plus coordinate-sort wrappers; here it
    # is one shared compiled function.

    def encode_z(self, y: SparseTensor):
        """h_a + integer quantization of z. Returns (z coded values
        round(z - median) [B, capz, Ch] int32, z row counts [B],
        overflow [B] — a full stride-16/32 pyramid buffer)."""
        nbr8 = self_kernel_map(y)
        c16_st, d16_nbr, c32_st, d32_nbr = self.pyramid(y)
        z, _, _ = self.hyper_analysis(y, nbr8, c16_st, d16_nbr, c32_st, d32_nbr)
        z_sym, _ = self.eb.quantize_symbols(z.feats)
        z_sym = jnp.where(z.valid[..., None], z_sym, 0)
        overflow = (c16_st.count >= self.caps.cap(16)) | (
            c32_st.count >= self.caps.cap(32)
        )
        return z_sym, z.count, overflow

    def eb_medians(self):
        return self.eb.medians()

    def decode_params(self, y_coords: SparseTensor, z_hat_feats: jax.Array):
        """Device-side half of decompress: rebuild (scales, means, q_hat)
        from decoded z features on the re-derived pyramid."""
        y = y_coords
        nbr8 = self_kernel_map(y)
        c16_st, d16_nbr, c32_st, d32_nbr = self.pyramid(y)
        nbr16 = self_kernel_map(c16_st)
        nbr32 = self_kernel_map(c32_st)
        z_hat = c32_st.with_feats(z_hat_feats)
        scales, means = self.hyper_synthesis(z_hat, nbr16, nbr32, c16_st, y, nbr8)
        indexes = GaussianConditional.build_indexes(
            scales, default_scale_table()
        )
        q_hat = (
            self.q_synthesis(z_hat, nbr16, nbr32, c16_st, y, nbr8)
            if self.use_q_head
            else None
        )
        return scales, means, indexes, q_hat
