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
    topk_mask,
    transpose_map,
)


class DownConv(nn.Module):
    """3^3 stride-2 downsampling conv with two execution paths over
    SHARED [27, Cin, Cout] weights:

      * sparse: kernel map onto the downsampled coordinate set
        (ME kernel3/stride2, /root/reference/model/transforms.py:49-51);
      * packed: 2^3-support dense conv on the space-to-depth packed tile
        grid (ops/tiles.downsample_pack / pack_stride2_kernel) — the TPU
        path; no gathers.
    """

    c_in: int
    c_out: int

    def setup(self):
        init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
        self.kernel = self.param("kernel", init, (27, self.c_in, self.c_out),
                                 jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (self.c_out,),
                               jnp.float32)

    def __call__(self, in_st: SparseTensor, out_st: SparseTensor,
                 nbr: jax.Array) -> SparseTensor:
        from ..ops.conv import sparse_conv_apply

        feats = sparse_conv_apply(in_st.feats, nbr, self.kernel, self.bias,
                                  out_st.valid)
        return out_st.with_feats(feats)

    # The packed execution path runs through the FUSED block-diagonal
    # conv in AnalysisTransform.ga_level (pack_stride2_kernel over the
    # merged h|c channels) — see models/transforms.py.


class ConvReluConv(nn.Module):
    """conv3 -> ReLU -> conv3 on a fixed coordinate set (shared kernel map)."""

    mid_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, st: SparseTensor, nbr: jax.Array) -> SparseTensor:
        x = SparseConv(self.mid_channels)(st, st, nbr)
        x = x.with_feats(nn.relu(x.feats))
        return SparseConv(self.out_channels)(x, x, nbr)


class ConvChain(nn.Module):
    """Stack of 3^3 convs over one coordinate set, with two execution
    paths over SHARED parameters:

      * sparse: gather-GEMM over a materialized kernel map (CPU/tests,
        small coordinate sets);
      * grid:   dense tiled einsums (ops/tiles.dense_conv) — the TPU
        path; per-row gathers measure ~100M/s and dominate runtime at
        vox10 scale.
    """

    c_in: int
    channels: Tuple[int, ...]
    relus: Tuple[bool, ...]

    def setup(self):
        init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
        cin = self.c_in
        kernels, biases = [], []
        for i, co in enumerate(self.channels):
            kernels.append(self.param(f"k{i}", init, (27, cin, co), jnp.float32))
            biases.append(self.param(f"k{i}_bias", nn.initializers.zeros, (co,), jnp.float32))
            cin = co
        self.kernels = kernels
        self.biases = biases

    def __call__(self, st: SparseTensor, nbr: jax.Array) -> SparseTensor:
        from ..ops.conv import sparse_conv_apply

        feats = st.feats
        for k_, b_, r in zip(self.kernels, self.biases, self.relus):
            feats = sparse_conv_apply(feats, nbr, k_, b_, st.valid)
            if r:
                feats = nn.relu(feats)
        return st.with_feats(feats)

    def grid(self, feats: jax.Array, nbr_rows: jax.Array, mask: jax.Array,
             live: Optional[jax.Array] = None) -> jax.Array:
        from ..ops import tiles as TL

        for k_, b_, r in zip(self.kernels, self.biases, self.relus):
            feats = TL.dense_conv(feats, nbr_rows, k_, b_, mask=mask, relu=r,
                                  live=live)
        return feats


class ScaledBlock(nn.Module):
    """FiLM residual block (/root/reference/model/blocks.py:10-53).

    x -> conv pair -> per-point (F * beta + gamma) -> conv pair (+ ReLU)
    -> + residual. ``beta_gamma`` is row-aligned with x (same coordinate
    set, canonical order). Dual sparse/grid paths (see ConvChain).
    """

    channels: int

    def setup(self):
        c = self.channels
        self.conv1 = ConvChain(c_in=c, channels=(c, c), relus=(True, False))
        self.conv2 = ConvChain(c_in=c, channels=(c, c), relus=(True, True))

    def __call__(self, st: SparseTensor, nbr: jax.Array, beta_gamma: jax.Array) -> SparseTensor:
        residual = st.feats
        x = self.conv1(st, nbr)
        beta, gamma = jnp.split(beta_gamma, 2, axis=-1)
        x = x.with_feats(x.feats * beta + gamma)
        x = self.conv2(x, nbr)
        return x.with_feats(x.feats + residual)

    def grid(self, feats: jax.Array, nbr_rows: jax.Array, mask: jax.Array,
             beta_gamma: jax.Array,
             live: Optional[jax.Array] = None) -> jax.Array:
        cells = mask.shape[-1]
        residual = feats
        x = self.conv1.grid(feats, nbr_rows, mask, live=live)
        B, Nt, _ = x.shape
        c = self.channels
        xs = x.reshape(B, Nt, cells, c)
        # -1: the FiLM tensor is 2c wide normally, width 2 under
        # condition_ablation (broadcasts against c like the sparse path).
        bg = beta_gamma.reshape(B, Nt, cells, -1)
        beta, gamma = jnp.split(bg, 2, axis=-1)
        m = mask[..., None].astype(xs.dtype)
        xs = (xs * beta + gamma) * m  # re-mask: gamma adds at empty cells
        x = self.conv2.grid(xs.reshape(B, Nt, cells * c), nbr_rows, mask,
                            live=live)
        return x + residual


class GenerativeUp(nn.Module):
    """Stride s -> s/2 generative upsample with occupancy prediction and
    per-item top-k pruning (/root/reference/model/blocks.py:78-181).

    Pipeline: 27-candidate expansion -> transposed conv -> conv pair ->
    occupancy logit -> top-k(k[b]) -> prune to capacity. Returns
    (pruned features, occupancy logits at all candidates).

    Two numerically equivalent execution paths over SHARED parameters
    (raw [27, Cin, Cout] taps, so checkpoints are path-agnostic):

      * tiled (tile_capacity > 0): rasterize candidates into dense 4^3
        tiles and run shifted dense einsums on the MXU (ops/tiles) —
        the fast path; per-element gathers measured ~100M/s on v5e make
        gather-style convs on ~10M-candidate sets take tens of seconds.
      * streamed: per-tap lookup+gather convs (ops/conv) — reference
        implementation and CPU/test path.

    Returns (pruned, occ, q_out, overflow) where overflow [B] flags a
    capacity overflow (candidate/tile buffer full, or fewer than k
    survivors) — a silently-corrupted reconstruction the codec runtime
    must turn into a loud error (SURVEY.md §7 hard part 1).
    """

    out_channels: int
    cand_capacity: int
    out_capacity: int
    tile_capacity: int = 0

    def _params(self, c_in: int):
        init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
        co = self.out_channels

        def pk(name, ci, cout):
            return (
                self.param(name, init, (27, ci, cout), jnp.float32),
                self.param(f"{name}_bias", nn.initializers.zeros, (cout,), jnp.float32),
            )

        return {
            "transpose": pk("transpose", c_in, co),
            "conv1": pk("conv1", co, co),
            "conv2": pk("conv2", co, co),
            "occ1": pk("occ1", co, co),
            "occ2": pk("occ2", co, 1),
            # Q-branch transposed conv: evaluates the 2-channel quality
            # map at the surviving coordinates (the reference's q_up_*
            # GenerativeUpBlocks in non-predicting mode,
            # /root/reference/model/transforms.py:209-211,276-290).
            "q_up": pk("q_up", 2, 2),
        }

    @nn.compact
    def __call__(
        self,
        st: SparseTensor,
        k: jax.Array,
        extract_occ: bool = True,
        q: Optional[SparseTensor] = None,
    ):
        p = self._params(st.num_channels)
        if self.tile_capacity > 0:
            return self._tiled(st, k, p, extract_occ, q)
        return self._streamed(st, k, p, extract_occ, q)

    def _streamed(self, st, k, p, extract_occ, q):
        from ..ops.conv import sparse_conv_streamed
        from ..ops import coords as Cc

        in_dtype = st.feats.dtype
        cand = expand_coords(st, self.cand_capacity)
        offs_t = -Cc.conv_offsets(3, cand.stride)
        offs = Cc.conv_offsets(3, cand.stride)

        x = cand.with_feats(
            sparse_conv_streamed(st, cand, offs_t, *p["transpose"]).astype(jnp.bfloat16)
        )
        h = x.with_feats(nn.relu(sparse_conv_streamed(x, x, offs, *p["conv1"])))
        x = h.with_feats(sparse_conv_streamed(h, h, offs, *p["conv2"]))
        h = x.with_feats(nn.relu(sparse_conv_streamed(x, x, offs, *p["occ1"])))
        occ = h.with_feats(
            sparse_conv_streamed(h, h, offs, *p["occ2"]).astype(jnp.float32)
        )
        keep = topk_mask(cand, occ.feats[..., 0], k)
        pruned = prune(x, keep, self.out_capacity)
        pruned = pruned.with_feats(pruned.feats.astype(in_dtype))
        ov = (cand.count >= self.cand_capacity) | (pruned.count < k)
        q_out = None
        if q is not None:
            qf = sparse_conv_streamed(q, pruned, offs_t, *p["q_up"],
                                      compute_dtype=jnp.float32)
            q_out = pruned.with_feats(qf)
        return pruned, (occ if extract_occ else None), q_out, ov

    def _tiled(self, st, k, p, extract_occ, q):
        from ..ops import tiles as TL

        in_dtype = st.feats.dtype
        cin = st.num_channels
        co = self.out_channels

        # Embed parents (and the row-aligned quality map) together.
        src = st if q is None else st.with_feats(
            jnp.concatenate([st.feats, q.feats.astype(st.feats.dtype)], axis=-1)
        )
        grid, emb = TL.build_upsample_grid(src, self.tile_capacity)
        nbr = TL.neighbor_rows(grid.keys, TL.grid_span(grid))
        cell_mask = grid.mask & grid.valid[:, :, None]  # [B, Nt, T^3]
        B, Nt = grid.keys.shape

        if q is not None:
            embs = emb.reshape(B, Nt, TL.PCELLS, cin + 2)
            emb_x = embs[..., :cin].reshape(B, Nt, TL.PCELLS * cin)
            emb_q = embs[..., cin:].reshape(B, Nt, TL.PCELLS * 2)
        else:
            emb_x, emb_q = emb, None

        def conv(f, kern_bias, relu=False):
            kern, bias = kern_bias
            return TL.dense_conv(f, nbr, kern, bias, mask=cell_mask, relu=relu,
                                 live=grid.count)

        kt, bt = p["transpose"]
        x = TL.transpose_dense_conv(
            emb_x.astype(jnp.bfloat16), nbr, kt, bt, mask=cell_mask,
            live=grid.count,
        )
        h = conv(x, p["conv1"], relu=True)
        x = conv(h, p["conv2"])
        h = conv(x, p["occ1"], relu=True)
        occ = conv(h, p["occ2"]).astype(jnp.float32)  # [B, Nt, T^3] (Cout=1)

        # Per-item top-k over masked dense logits: sort-free radix select
        # (a double argsort over the ~24M stride-1 candidate cells was a
        # decode hotspot; ops/sparse.topk_mask_flat is O(N)).
        from ..ops.sparse import topk_mask_flat

        keep = topk_mask_flat(
            occ.reshape(B, -1), cell_mask.reshape(B, -1), k
        ).reshape(cell_mask.shape)

        if q is not None:
            kq, bq = p["q_up"]
            q_child = TL.transpose_dense_conv(emb_q, nbr, kq, bq, mask=cell_mask,
                                              compute_dtype=jnp.float32,
                                              live=grid.count)
            both = jnp.concatenate(
                [x.reshape(B, Nt, TL.CELLS, co),
                 q_child.reshape(B, Nt, TL.CELLS, 2).astype(x.dtype)],
                axis=-1,
            ).reshape(B, Nt, TL.CELLS * (co + 2))
            ext = TL.extract_sparse(grid, both, keep, self.out_capacity,
                                    feats_dtype=jnp.float32)
            pruned = ext.with_feats(ext.feats[..., :co].astype(in_dtype))
            q_out = ext.with_feats(ext.feats[..., co:].astype(jnp.float32))
        else:
            pruned = TL.extract_sparse(grid, x, keep, self.out_capacity,
                                       feats_dtype=in_dtype)
            q_out = None
        occ_sparse = (
            TL.extract_sparse(grid, occ, cell_mask, self.cand_capacity)
            if extract_occ
            else None
        )
        ov = (grid.count >= self.tile_capacity) | (pruned.count < k)
        return pruned, occ_sparse, q_out, ov


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


class PredictHead(nn.Module):
    """Per-scale FiLM predictor: conv(n) -> ReLU -> Dense(n) -> ReLU ->
    conv(2n) (/root/reference/model/blocks.py:206-226). Dual paths."""

    c_in: int
    n: int

    def setup(self):
        self.conv_a = ConvChain(c_in=self.c_in, channels=(self.n,),
                                relus=(True,))
        self.dense = nn.Dense(self.n)
        self.conv_b = ConvChain(c_in=self.n, channels=(2 * self.n,),
                                relus=(False,))

    def __call__(self, x: SparseTensor, nbr: jax.Array) -> jax.Array:
        h = self.conv_a(x, nbr)
        h = h.with_feats(nn.relu(self.dense(h.feats)))
        return self.conv_b(h, nbr).feats

    def grid(self, feats: jax.Array, nbr_rows: jax.Array, mask: jax.Array,
             live: Optional[jax.Array] = None) -> jax.Array:
        cells = mask.shape[-1]
        h = self.conv_a.grid(feats, nbr_rows, mask, live=live)
        B, Nt, FC = h.shape
        h = nn.relu(self.dense(h.reshape(B, Nt, cells, self.n)))
        m = mask[..., None].astype(h.dtype)
        h = (h * m).reshape(B, Nt, cells * self.n)
        return self.conv_b.grid(h, nbr_rows, mask, live=live)


class ConditionEncoder(nn.Module):
    """Encoder-side quality-map pyramid
    (/root/reference/model/blocks.py:185-251).

    pre_conv, then per stage: stride-2 down conv (sharing the feature
    branch's coordinate sets) and a predict head producing per-point
    FiLM (beta, gamma) of width 2*N_scale. ``condition_ablation``
    bypasses the predict heads (Ablation_NoCondition config).

    Sparse path: down_plans per stage (out_st, nbr) from the analysis
    transform's downsample maps — identical coordinate sets by
    construction; self_nbrs per stage self kernel map. The tiled path is
    driven stage-wise by AnalysisTransform via the ``pre``/``downs``/
    ``predicts`` submodules' grid methods.
    """

    n_scales: Sequence[int]
    n_features: Sequence[int] = (2, 2, 2, 2)
    condition_ablation: bool = False

    def setup(self):
        self.pre = ConvChain(c_in=2, channels=(self.n_features[0],),
                             relus=(True,))
        self.downs = [
            DownConv(self.n_features[i], self.n_features[i + 1])
            for i in range(len(self.n_scales))
        ]
        if not self.condition_ablation:
            self.predicts = [
                PredictHead(self.n_features[i + 1], n)
                for i, n in enumerate(self.n_scales)
            ]

    def __call__(
        self,
        q: SparseTensor,
        nbr0: jax.Array,
        down_plans: Sequence[Tuple[SparseTensor, jax.Array]],
        self_nbrs: Sequence[jax.Array],
    ):
        x = self.pre(q, nbr0)
        beta_gammas = []
        for i, (out_st, nbr_down) in enumerate(down_plans):
            x = self.downs[i](x, out_st, nbr_down)
            if self.condition_ablation:
                beta_gammas.append(x.feats)
                continue
            beta_gammas.append(self.predicts[i](x, self_nbrs[i]))
        return x, beta_gammas


class QPredict(nn.Module):
    """Decoder-side FiLM head from the 2-channel quality map
    (/root/reference/model/transforms.py:214-234): conv3 -> ReLU ->
    conv3 -> ReLU -> conv3 producing 2*channels. Dual sparse/grid."""

    channels: int

    def setup(self):
        c = self.channels
        self.chain = ConvChain(c_in=2, channels=(c, c, 2 * c),
                               relus=(True, True, False))

    def __call__(self, q: SparseTensor, nbr: jax.Array) -> jax.Array:
        return self.chain(q, nbr).feats

    def grid(self, qfeats: jax.Array, nbr_rows: jax.Array, mask: jax.Array,
             live: Optional[jax.Array] = None) -> jax.Array:
        return self.chain.grid(qfeats, nbr_rows, mask, live=live)
