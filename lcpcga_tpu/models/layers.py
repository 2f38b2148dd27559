"""Model building blocks: FiLM-conditioned residual blocks, generative
upsampling with occupancy top-k, and the encoder-side condition pyramid.

TPU-native re-design of /root/reference/model/blocks.py. Key structural
differences from the reference (beyond ME -> gather-GEMM convs):

  * feature/condition tensors at the same stride share one canonical
    coordinate ordering, so FiLM scale/shift and residual adds are pure
    elementwise ops — no ``features_at_coordinates`` lookups
    (/root/reference/model/blocks.py:37,50 needed them because ME row
    order is nondeterministic);
  * the occupancy head emits 1 channel (the reference allocates N_out
    channels and reads channel 0, /root/reference/model/blocks.py:94-98,
    134 — wasted compute we do not replicate);
  * the dead ``MinkowskiGDN`` constructed-but-never-called in ScaledBlock
    (/root/reference/model/blocks.py:27, SURVEY.md #5) is omitted from
    the forward path; a GDN layer lives in models/gdn.py for parity.
  * per-batch Python loops (``_topk_prediction``,
    /root/reference/model/blocks.py:130-150) become batched masked-rank
    top-k inside jit (ops/sparse.topk_mask).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    SparseConv,
    SparseTensor,
    expand_coords,
    prune,
    self_kernel_map,
    topk_mask,
    transpose_map,
)


class ConvReluConv(nn.Module):
    """conv3 -> ReLU -> conv3 on a fixed coordinate set (shared kernel map)."""

    mid_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, st: SparseTensor, nbr: jax.Array) -> SparseTensor:
        x = SparseConv(self.mid_channels)(st, st, nbr)
        x = x.with_feats(nn.relu(x.feats))
        return SparseConv(self.out_channels)(x, x, nbr)


class ScaledBlock(nn.Module):
    """FiLM residual block (/root/reference/model/blocks.py:10-53).

    x -> conv pair -> per-point (F * beta + gamma) -> conv pair (+ ReLU)
    -> + residual. ``beta_gamma`` is row-aligned with ``st`` (same
    coordinate set, canonical order): feats [B, N, 2C].
    """

    channels: int

    @nn.compact
    def __call__(self, st: SparseTensor, nbr: jax.Array, beta_gamma: jax.Array) -> SparseTensor:
        residual = st.feats
        x = ConvReluConv(self.channels, self.channels)(st, nbr)
        beta, gamma = jnp.split(beta_gamma, 2, axis=-1)
        x = x.with_feats(x.feats * beta + gamma)
        x = ConvReluConv(self.channels, self.channels)(x, nbr)
        x = x.with_feats(nn.relu(x.feats))
        return x.with_feats(x.feats + residual)


class GenerativeUp(nn.Module):
    """Stride s -> s/2 generative upsample with occupancy prediction and
    per-item top-k pruning (/root/reference/model/blocks.py:78-181).

    Pipeline: 27-candidate coordinate expansion -> transposed conv ->
    conv pair -> occupancy logit -> top-k(k[b]) -> prune to capacity.
    Returns (pruned features, occupancy logits at all candidates).

    Candidate sets reach ~15x the point count at full resolution, so all
    convs on them are streamed (per-tap lookup inside a scan,
    ops/conv.sparse_conv_streamed) instead of materializing [M, 27]
    kernel maps.
    """

    out_channels: int
    cand_capacity: int
    out_capacity: int

    @nn.compact
    def __call__(
        self, st: SparseTensor, k: jax.Array
    ) -> Tuple[SparseTensor, SparseTensor]:
        from ..ops import SparseConvAt

        in_dtype = st.feats.dtype
        cand = expand_coords(st, self.cand_capacity)
        x = SparseConvAt(self.out_channels, transpose=True)(st, cand)
        # Candidate-set activations live in bf16: at full resolution the
        # candidate set is ~15x the point count and several [M, C]
        # buffers are live at once — f32 here is what OOMs a 16GB chip.
        x = x.with_feats(x.feats.astype(jnp.bfloat16))
        h = SparseConvAt(self.out_channels)(x, x)
        h = h.with_feats(nn.relu(h.feats))
        x = SparseConvAt(self.out_channels)(h, h)
        h = SparseConvAt(self.out_channels)(x, x)
        h = h.with_feats(nn.relu(h.feats))
        occ = SparseConvAt(1)(h, h)
        occ = occ.with_feats(occ.feats.astype(jnp.float32))
        keep = topk_mask(cand, occ.feats[..., 0], k)
        pruned = prune(x, keep, self.out_capacity)
        pruned = pruned.with_feats(pruned.feats.astype(in_dtype))
        return pruned, occ


class UpsampleTo(nn.Module):
    """Transposed conv (stride 2) evaluated directly at given target coords.

    Used by the decoder's Q branch: the reference expands generatively
    then prunes to the feature branch's surviving coords
    (/root/reference/model/blocks.py:179-181); evaluating at the target
    set directly is equivalent (targets are a subset of the expansion)
    and skips the 27x candidate buffer. Also implements h_s / h_q
    upsampling onto the deterministic latent pyramid
    (/root/reference/model/entropy_models.py:134-144,296-306).
    """

    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, st: SparseTensor, target: SparseTensor) -> SparseTensor:
        nbr_t = transpose_map(st, target.keys, kernel_size=self.kernel_size)
        return SparseConv(self.out_channels)(st, target, nbr_t)


class ConditionEncoder(nn.Module):
    """Encoder-side quality-map pyramid
    (/root/reference/model/blocks.py:185-251).

    pre_conv, then per stage: stride-2 down conv (sharing the feature
    branch's coordinate sets) and a predict head producing per-point
    FiLM (beta, gamma) of width 2*N_scale. ``condition_ablation``
    bypasses the predict heads (Ablation_NoCondition config).

    down_plans: per stage (out_st, nbr) from the analysis transform's
    downsample maps — identical coordinate sets by construction.
    self_nbrs: per stage self kernel map at the downsampled level.
    """

    n_scales: Sequence[int]
    n_features: Sequence[int] = (2, 2, 2, 2)
    condition_ablation: bool = False

    @nn.compact
    def __call__(
        self,
        q: SparseTensor,
        nbr0: jax.Array,
        down_plans: Sequence[Tuple[SparseTensor, jax.Array]],
        self_nbrs: Sequence[jax.Array],
    ):
        x = SparseConv(self.n_features[0])(q, q, nbr0)
        x = x.with_feats(nn.relu(x.feats))

        beta_gammas = []
        for i, (out_st, nbr_down) in enumerate(down_plans):
            x = SparseConv(self.n_features[i + 1])(x, out_st, nbr_down)
            if self.condition_ablation:
                beta_gammas.append(x.feats)
                continue
            n = self.n_scales[i]
            h = SparseConv(n)(x, x, self_nbrs[i])
            h = h.with_feats(nn.relu(h.feats))
            h = h.with_feats(nn.relu(nn.Dense(n)(h.feats)))
            h = SparseConv(2 * n)(h, h, self_nbrs[i])
            beta_gammas.append(h.feats)
        return x, beta_gammas


class QPredict(nn.Module):
    """Decoder-side FiLM head from the 2-channel quality map
    (/root/reference/model/transforms.py:214-234): conv3 -> ReLU ->
    conv3 -> ReLU -> conv3 producing [B, N, 2*channels]."""

    channels: int

    @nn.compact
    def __call__(self, q: SparseTensor, nbr: jax.Array) -> jax.Array:
        h = SparseConv(self.channels)(q, q, nbr)
        h = h.with_feats(nn.relu(h.feats))
        h = SparseConv(self.channels)(h, h, nbr)
        h = h.with_feats(nn.relu(h.feats))
        h = SparseConv(2 * self.channels)(h, h, nbr)
        return h.feats
