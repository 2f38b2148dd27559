"""PointCloudCodec — bit-level compress / decompress orchestration.

TPU-native equivalent of /root/reference/model/model.py:95-315
(``ColorModel.compress/decompress/save_bitstream/load_bitstream``).
The pipeline mixes four jitted device stages with the host-side native
coders (lcpcga_tpu/coding):

  compress:   [jit] analysis  ->  [jit] encode_z  ->  host rANS(z)
              -> [jit] decode_params (decoder simulation)
              -> host rANS(y) + octree(coords) -> container
  decompress: container -> host octree -> host rANS(z)
              -> [jit] decode_params (SAME compiled fn as compress)
              -> host rANS(y) -> [jit] synthesis -> colors

Bit-exactness rests on three invariants (SURVEY.md §7 hard part 2):
  1. canonical sorted coordinate order is a SparseTensor invariant, so
     encoder and decoder enumerate symbols identically;
  2. ẑ/ŷ are reconstructed as ``integer + (medians|means)`` in host
     numpy on both sides;
  3. the Gaussian parameter regrowth runs through one shared compiled
     function on both sides.

The latent coordinates are coded by the in-process octree coder instead
of shelling out to tmc3 through ASCII PLY files
(/root/reference/model/model.py:318-395) — no subprocess in the loop.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coding import Bitstream, octree_decode, octree_encode, rans_decode, rans_encode
from .coding.native import get_lib
from .models import ColorModel, GaussianConditional, default_scale_table
from .models.codec import ColorModel as _CM
from .ops import SparseTensor, from_coords
from .ops import coords as C

LATENT_STRIDE = 8
Z_STRIDE = 32
# Escape-list capacity for the int8 residual wire carrier (entries with
# |v| > 127; trained residuals are overwhelmingly sub-int8).
ESC_CAP = 4096


def _phase_marks(tag: str):
    """LCPCGA_PROFILE=1: host-observed per-phase wall clocks inside
    compress/decompress. Device dispatch is async, so a phase's device
    time shows up at its first blocking fetch — these marks localize
    where the HOST actually waits (tunnel transfers + blocked syncs),
    which is exactly the end-to-end-minus-stage-compute gap."""
    if not os.environ.get("LCPCGA_PROFILE"):
        return lambda name: None
    state = {"t": time.perf_counter()}

    def mark(name: str):
        now = time.perf_counter()
        print(f"[{tag}] {name}: {now - state['t']:.3f}s", flush=True)
        state["t"] = now

    return mark


def _channel_indexes(n: int, c: int) -> np.ndarray:
    """Row-major [n, c] flatten: context = channel id."""
    return np.tile(np.arange(c, dtype=np.int32), n)


def _frac_pct(name: str, frac: float) -> int:
    """Tile fractions ride as whole percents in the header; a fraction
    the u8 percent can't represent exactly would reconstruct a decoder
    with different buffer sizes, so refuse at encode time."""
    pct = int(round(frac * 100))
    if abs(frac * 100 - pct) > 1e-6:
        raise ValueError(
            f"capacity fraction {name}={frac} is not representable at "
            f"1/100 resolution; pick a whole-percent fraction"
        )
    return pct


def capacities_for_stream(stream) -> "Capacities":
    """Reconstruct the encoder's FULL capacity profile (row caps,
    candidate factor, tile fractions — every buffer-sizing knob of the
    compiled program) from a v2 bitstream header — bytes + weights
    fully determine the decoder (decoder self-sufficiency of
    /root/reference/model/model.py:267-315)."""
    from .models import Capacities

    if not stream.caps or not any(stream.caps):
        raise ValueError("stream header carries no capacity profile")
    return Capacities(
        caps=tuple(int(c) for c in stream.caps),
        cand_factor=int(stream.cand_factor),
        tile_fraction=stream.tile_pct / 100.0,
        same_tile_fraction=stream.same_tile_pct / 100.0,
        post_tile_fraction=stream.post_tile_pct / 100.0,
        stack_tile=int(getattr(stream, "stack_tile", 2)),
    )


def codec_for_stream(model_cfg: dict, params, stream) -> "PointCloudCodec":
    """Build a decoder for a stream from its header alone (plus model
    config + weights). The codec is compiled for the stream's capacity
    profile; reuse it for every stream sharing that profile (see
    Capacities.bucketed)."""
    from .models.codec import make_model

    caps = capacities_for_stream(stream)
    model = make_model(model_cfg, caps)
    codec = PointCloudCodec(model, params, depth=stream.depth)
    codec.update()
    return codec


class PointCloudCodec:
    """Host-side codec wrapper around a trained ColorModel.

    Batch size 1 per stream (like the reference's file codec,
    /root/reference/model/model.py:298-301); batched multi-frame encode
    goes through the parallel module instead.
    """

    def __init__(self, model: ColorModel, params, depth: int = C.COORD_BITS,
                 strict_overflow: bool = True):
        self.model = model
        self.params = params
        self.caps = model.caps
        self.depth = depth
        # strict_overflow=False downgrades capacity-overflow errors to
        # warnings — ONLY for timing benchmarks with random weights,
        # whose top-k selections are spread wider than any trained
        # model's and can overflow tile grids sized for real surfaces.
        self.strict_overflow = strict_overflow
        self.scale_table = default_scale_table()
        self.tables_y = None
        self.tables_z = None
        self.z_medians = None

        m = model

        def fwd_jit(f):
            """jit a codec program marked forward-only at trace time:
            the tile convs then use the dynamic-trip while_loop chunk
            runner (true dead-chunk skipping, no lax.cond buffers).
            Codec programs are never differentiated — training goes
            through model.apply/__call__, not these stage methods."""
            import functools

            from .ops import tiles as _TL

            @functools.wraps(f)
            def traced(*args, **kwargs):
                with _TL.forward_only():
                    return f(*args, **kwargs)

            return jax.jit(traced)

        if model.caps.tile_fraction > 0 and model.caps.analysis_tiles:
            # Tiled analysis as per-level jitted programs (HBM bounding,
            # mirroring the staged synthesis below).
            @fwd_jit
            def ga0_fn(params, x, q):
                return m.apply(params, x, q, method=_CM.analysis_stage0)

            ga_level_fns = [
                fwd_jit(lambda params, grid, feats, _meth=meth:
                        m.apply(params, grid, feats, method=_meth))
                for meth in (_CM.analysis_level0, _CM.analysis_level1,
                             _CM.analysis_level2)
            ]

            @fwd_jit
            def ga_fin_fn(params, grid, feats):
                return m.apply(params, grid, feats, method=_CM.analysis_finish)

            def analysis_fn(params, x, q):
                grid, feats, ov = ga0_fn(params, x, q)
                counts = []
                for i in range(3):
                    grid, feats, cnt, ovi = ga_level_fns[i](params, grid, feats)
                    if i < 2:
                        counts.append(cnt)
                    ov = ov | ovi
                y, q_latent, ovf = ga_fin_fn(params, grid, feats)
                k = jnp.stack([counts[1], counts[0], x.count], axis=1)
                return y, q_latent, k, ov | ovf
        else:
            @fwd_jit
            def analysis_fn(params, x, q):
                return m.apply(params, x, q, method=_CM.analysis)

        @fwd_jit
        def encode_z_fn(params, y):
            return m.apply(params, y, method=_CM.entropy_encode_z)

        @fwd_jit
        def decode_params_fn(params, y_coords, z_hat_feats):
            # indexes come back uint8 (scale-table ids < 256): the
            # decoder fetches them straight into the rANS contexts —
            # one dispatch + tunnel round trip fewer than a separate
            # cast program, and a 4x smaller wire than int32.
            scales, means, indexes, q_hat = m.apply(
                params, y_coords, z_hat_feats,
                method=_CM.entropy_decode_params)
            return scales, means, indexes.astype(jnp.uint8), q_hat

        if model.separate_q_model:
            @fwd_jit
            def encode_qz_fn(params, q_latent):
                return m.apply(params, q_latent, method=_CM.entropy_encode_qz)

            @fwd_jit
            def decode_params_q_fn(params, q_coords, qz_feats):
                return m.apply(params, q_coords, qz_feats,
                               method=_CM.entropy_decode_params_q)

            self._encode_qz = encode_qz_fn
            self._decode_params_q = decode_params_q_fn

        # Synthesis as four separate jitted stage programs: the combined
        # vox10 synthesis program OOMs HBM; staged execution caps the
        # per-program peak at one level's buffers.
        @fwd_jit
        def synth_a_fn(params, y_hat, q_hat, k):
            return m.apply(params, y_hat, q_hat, k, method=_CM.synthesis_stage_a)

        @fwd_jit
        def synth_b_fn(params, x, qf, k):
            return m.apply(params, x, qf, k, method=_CM.synthesis_stage_b)

        @fwd_jit
        def synth_c_fn(params, x, qf, k):
            return m.apply(params, x, qf, k, method=_CM.synthesis_stage_c)

        @fwd_jit
        def synth_d_fn(params, x):
            x_hat, ov = m.apply(params, x, method=_CM.synthesis_stage_d)
            colors = jnp.clip(jnp.round(x_hat.feats * 255.0), 0.0, 255.0) / 255.0
            return x_hat.with_feats(colors), ov

        # Wire-compact transfer helpers: the tunneled TPU moves
        # ~10-60 MB/s host<->device, so the y-latent round trip ships
        # int8 residuals (+ a small escape list for the rare |v| > 127
        # entries, packed into ONE int32 fetch) and uint8 scale indexes
        # instead of f32 tensors. Trained residuals are overwhelmingly
        # sub-int8; overflowing the escape budget falls back to the
        # int16 path, int16 overflow to the f32 path. Values are integer
        # exact on every path — only the carrier width differs.
        @jax.jit
        def quantize_y_fn(y_feats, means, indexes, valid):
            v = jnp.round(y_feats - means) * valid[..., None]
            overflow = jnp.max(jnp.abs(v)) > 32000.0
            flat = v.reshape(v.shape[0], -1)
            esc = jnp.abs(flat) > 127.0
            n_esc = jnp.sum(esc, axis=-1).astype(jnp.int32)

            def esc_item(flat_i, esc_i, n_i):
                dest = jnp.where(esc_i,
                                 jnp.cumsum(esc_i.astype(jnp.int32)) - 1,
                                 ESC_CAP)
                pos = jnp.full((ESC_CAP,), -1, jnp.int32).at[dest].set(
                    jnp.arange(flat_i.shape[0], dtype=jnp.int32), mode="drop")
                val = jnp.zeros((ESC_CAP,), jnp.int32).at[dest].set(
                    flat_i.astype(jnp.int32), mode="drop")
                return jnp.concatenate([pos, val, n_i[None]])

            # [B, 2*ESC_CAP + 1]; the trailing slot carries the escape
            # count so the host learns it in the same small fetch.
            esc_packed = jax.vmap(esc_item)(flat, esc, n_esc)
            v8 = jnp.clip(v, -127.0, 127.0).astype(jnp.int8)
            return (v8, esc_packed, v.astype(jnp.int16),
                    indexes.astype(jnp.uint8), overflow)

        @jax.jit
        def dequantize_y_fn(v8_pad, esc_packed, means, valid):
            B = v8_pad.shape[0]
            flat = v8_pad.reshape(B, -1).astype(jnp.float32)

            def apply_esc(flat_i, esc_i):
                pos, val = esc_i[:ESC_CAP], esc_i[ESC_CAP:]
                safe = jnp.where(pos >= 0, pos, flat_i.shape[0])
                return flat_i.at[safe].set(val.astype(jnp.float32),
                                           mode="drop")

            flat = jax.vmap(apply_esc)(flat, esc_packed)
            y = flat.reshape(v8_pad.shape) + means
            return jnp.where(valid[..., None], y, 0.0)

        @jax.jit
        def dequantize_y16_fn(v16_pad, means, valid):
            y = v16_pad.astype(jnp.float32) + means
            return jnp.where(valid[..., None], y, 0.0)

        @jax.jit
        def z_hat_fn(z_vals, z_count, medians):
            """Device-side ẑ = int + medians, zero beyond the row count.
            One f32 add of an exactly-representable integer — a single
            IEEE-754 rounding, bitwise identical to the decoder's host
            numpy add, so the encoder can feed decode_params without a
            z round trip through the tunnel."""
            zh = z_vals.astype(jnp.float32) + medians[None, None, :]
            mask = jnp.arange(z_vals.shape[1])[None, :] < z_count[:, None]
            return jnp.where(mask[..., None], zh, 0.0)

        self._quantize_y = quantize_y_fn
        self._dequantize_y = dequantize_y_fn
        self._dequantize_y16 = dequantize_y16_fn
        self._z_hat = z_hat_fn

        def synthesis_fn(params, y_hat, q_hat, k):
            stage_marks = (
                _phase_marks("synthesis")
                if os.environ.get("LCPCGA_PROFILE") == "2" else None
            )

            def bar(name, out):
                # LCPCGA_PROFILE=2: block between stages to attribute
                # device time (the async chain hides it in one sync).
                if stage_marks is not None:
                    jax.block_until_ready(out)
                    stage_marks(name)
                return out

            x, qf, _, ov_a = bar("a", synth_a_fn(params, y_hat, q_hat, k))
            x, qf, _, ov_b = bar("b", synth_b_fn(params, x, qf, k))
            x, _, ov_c = bar("c", synth_c_fn(params, x, qf, k))
            x_hat, ov_d = bar("d", synth_d_fn(params, x))
            return x_hat, ov_a | ov_b | ov_c | ov_d

        self._analysis = analysis_fn
        self._encode_z = encode_z_fn
        self._decode_params = decode_params_fn
        self._synthesis = synthesis_fn
        # Individual stage programs (profiling / staged drivers).
        self._synth_a = synth_a_fn
        self._synth_b = synth_b_fn
        self._synth_c = synth_c_fn
        self._synth_d = synth_d_fn

    # -- update(): bake CDF tables (/root/reference/model/model.py:30-36) --

    def update(self):
        get_lib()  # build the native coder eagerly
        self.tables_y = GaussianConditional.build_codec_tables(self.scale_table)
        # One jitted device call for the density window; slicing +
        # quantization on host (eager TPU dispatch is ~seconds/op
        # through the tunnel — never evaluate the EB pointwise).
        pmf, cdf_lo, cdf_hi = jax.jit(
            lambda p: self.model.apply(p, method=_CM.eb_pmf_window)
        )(self.params)
        quantiles, medians = jax.jit(
            lambda p: (
                self.model.apply(p, method=_CM.eb_quantiles),
                self.model.apply(p, method=_CM.eb_medians),
            )
        )(self.params)
        from .models.entropy import EntropyBottleneck

        self.tables_z = EntropyBottleneck.tables_from_window(
            quantiles, pmf, cdf_lo, cdf_hi
        )
        self.z_medians = np.asarray(medians).astype(np.float32)
        if self.model.separate_q_model:
            pmf_q, lo_q, hi_q = jax.jit(
                lambda p: self.model.apply(p, method=_CM.eb_q_pmf_window)
            )(self.params)
            q_quant, q_med = jax.jit(
                lambda p: (
                    self.model.apply(p, method=_CM.eb_q_quantiles),
                    self.model.apply(p, method=_CM.eb_q_medians),
                )
            )(self.params)
            self.tables_qz = EntropyBottleneck.tables_from_window(
                q_quant, pmf_q, lo_q, hi_q
            )
            self.qz_medians = np.asarray(q_med).astype(np.float32)

    def _require_tables(self):
        if self.tables_y is None:
            raise RuntimeError("call update() before compress()/decompress()")

    # -- input packing --

    def _pack_input(self, coords: np.ndarray, colors: np.ndarray) -> SparseTensor:
        cap = self.caps.cap(1)
        n = coords.shape[0]
        if n > cap:
            raise ValueError(f"cloud has {n} points, codec capacity {cap}")
        # Compact wire dtypes (u16 coords + f16 colors halve the upload;
        # the tunnel moves ~10-60 MB/s) widened on device. f16 keeps
        # ~3 decimal digits of color — inputs are 8-bit-derived anyway.
        pc = np.zeros((1, cap, 3), np.uint16)
        pf = np.zeros((1, cap, 3), np.float16)
        pv = np.zeros((1, cap), bool)
        pc[0, :n] = coords
        pf[0, :n] = colors
        pv[0, :n] = True
        if not hasattr(self, "_pack_fn"):
            self._pack_fn = jax.jit(
                lambda pc, pf, pv: from_coords(
                    pc.astype(jnp.int32), pf.astype(jnp.float32), pv
                )
            )
        return self._pack_fn(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))

    def _q_tensor(self, x: SparseTensor, q) -> SparseTensor:
        if isinstance(q, tuple):
            qg, qa = q
            qf = jnp.stack(
                [jnp.full(x.keys.shape, qg, jnp.float32),
                 jnp.full(x.keys.shape, qa, jnp.float32)],
                axis=-1,
            )
            qf = jnp.where(x.valid[..., None], qf, 0.0)
            return x.with_feats(qf)
        raise ValueError("q must be a (q_g, q_a) tuple or use compress_with_qmap")

    def _coords_st(self, keys: jax.Array, count, stride: int) -> SparseTensor:
        return SparseTensor(
            keys=keys,
            feats=jnp.zeros(keys.shape + (0,), jnp.float32),
            count=count,
            stride=stride,
        )

    # -- compress --

    def compress(
        self,
        coords: np.ndarray,
        colors: np.ndarray,
        q: Tuple[float, float],
        path: Optional[str] = None,
        q_map: Optional[np.ndarray] = None,
        return_debug: bool = True,
    ):
        """coords [N,3] int, colors [N,3] float in [0,1], q = (q_g, q_a).

        Returns (Bitstream, debug dict). If ``path`` is given the stream
        is also written to disk. ``return_debug=False`` skips the debug
        tensor fetches (tunnel transfers) — use for timing.
        """
        self._require_tables()
        mark = _phase_marks("compress")
        x = self._pack_input(coords, colors)
        mark("pack_input")
        if q_map is not None:
            qf = jnp.zeros((1, x.capacity, 2), jnp.float32)
            qf = qf.at[0, : q_map.shape[0]].set(jnp.asarray(q_map, jnp.float32))
            q_st = x.with_feats(jnp.where(x.valid[..., None], qf, 0.0))
        else:
            q_st = self._q_tensor(x, q)

        y, q_latent, k, ov_a = self._analysis(self.params, x, q_st)
        z_vals_dev, z_count_dev, ov_z = self._encode_z(self.params, y)
        mark("analysis+encode_z dispatch")

        # Device-side ẑ feeds the decoder-simulation program directly:
        # the z ints only come to the host for the rANS payload, OFF the
        # critical path (the old host z_hat round trip serialized
        # analysis -> fetch -> upload -> decode_params).
        z_hat_dev = self._z_hat(z_vals_dev, z_count_dev,
                                jnp.asarray(self.z_medians))
        y_coords = self._coords_st(y.keys, y.count, LATENT_STRIDE)
        scales, means, indexes, q_hat = self._decode_params(
            self.params, y_coords, z_hat_dev
        )
        v8, esc_packed, v16, idx8, wide = self._quantize_y(
            y.feats, means, indexes, y.valid
        )
        mark("device chain dispatch")

        # ONE blocking sync now that the full device chain is enqueued.
        # Loud overflow detection (VERDICT r1 #5/#6): a full capacity
        # buffer means dropped coordinates and a silently-corrupted
        # stream — detected here, after dispatch, so the device stays
        # busy through the host wait; the failure is identical.
        ov_a_np, ov_z_np, n_y_np, n_z_np = jax.device_get(
            (ov_a, ov_z, y.count, z_count_dev)
        )
        n_y = int(n_y_np[0])
        n_z = int(n_z_np[0])
        mark("counts/overflow sync")
        if bool(ov_a_np[0]) or bool(ov_z_np[0]) or n_y >= self.caps.cap(
            LATENT_STRIDE
        ):
            msg = (
                "capacity overflow during encode: a pyramid level filled its "
                f"static buffer (caps={self.caps.caps}). Re-build the codec "
                "with a larger capacity profile (Capacities.for_points / "
                "for_cloud with more margin)."
            )
            if self.strict_overflow:
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg)

        # Host: z stream.
        z_vals = np.asarray(z_vals_dev[0, :n_z]).astype(np.int32)  # [n_z, Ch]
        ch = z_vals.shape[1]
        z_payload = rans_encode(z_vals.ravel(), _channel_indexes(n_z, ch), self.tables_z)
        mark("z_fetch+rans_z")

        # Host: y stream (residuals quantized on device, shipped int8 +
        # escape list + uint8 indexes; escape-budget overflow falls back
        # to int16, int16 overflow to the wide f32 path).
        if bool(np.asarray(wide)):
            y_feats = np.asarray(y.feats[0, :n_y], np.float32)
            means_host = np.asarray(means[0, :n_y], np.float32)
            v_y = np.round(y_feats - means_host).astype(np.int32)
        else:
            ep = np.asarray(esc_packed[0])
            n_esc = int(ep[-1])
            if n_esc > ESC_CAP:
                v_y = np.asarray(v16[0, :n_y]).astype(np.int32)
            else:
                v_y = np.asarray(v8[0, :n_y]).astype(np.int32)
                if n_esc:
                    pos = ep[:n_esc]
                    val = ep[ESC_CAP:ESC_CAP + n_esc]
                    flat = v_y.reshape(-1)
                    # Escapes are valid-masked on device, so every
                    # position falls inside the first n_y rows.
                    flat[pos] = val
        mark("quantize_y block+residual fetch")
        idx_np = np.asarray(idx8[0, :n_y]).astype(np.int32)
        mark("idx fetch")
        y_payload = rans_encode(v_y.ravel(), idx_np.ravel(), self.tables_y)
        mark("rans_y")

        # Host: latent coordinates, losslessly (stride-8 grid).
        y_xyz = np.asarray(C.unpack(y.keys[0, :n_y]))
        grid = y_xyz // LATENT_STRIDE
        points_payload = octree_encode(grid, self.depth - 3)
        mark("coords fetch+octree")

        # separate_q_model ablation: the quality map rides in its own
        # hyperprior streams (mirrors the y/z pattern bit-exactly;
        # /root/reference/model/model.py:129-135).
        q_payload = b""
        qz_payload = b""
        n_qz = 0
        if self.model.separate_q_model:
            qz_vals_dev, qz_count_dev, _ = self._encode_qz(
                self.params, q_latent
            )
            n_qz = int(qz_count_dev[0])
            qch = self.qz_medians.shape[0]
            qz_vals = np.asarray(qz_vals_dev[0, :n_qz]).astype(np.int32)
            qz_payload = rans_encode(
                qz_vals.ravel(), _channel_indexes(n_qz, qch), self.tables_qz
            )
            qz_hat = qz_vals.astype(np.float32) + self.qz_medians[None, :]
            qz_pad = np.zeros((1, self.caps.cap(Z_STRIDE), qch), np.float32)
            qz_pad[0, :n_qz] = qz_hat
            y_coords_q = self._coords_st(y.keys, y.count, LATENT_STRIDE)
            _, q_means, q_idx, _ = self._decode_params_q(
                self.params, y_coords_q, jnp.asarray(qz_pad)
            )
            q_feats = np.asarray(q_latent.feats[0, :n_y], np.float32)
            qm_np = np.asarray(q_means[0, :n_y], np.float32)
            v_q = np.round(q_feats - qm_np).astype(np.int32)
            q_payload = rans_encode(
                v_q.ravel(), np.asarray(q_idx[0, :n_y], np.int32).ravel(),
                self.tables_y,
            )

        k_np = [int(v) for v in np.asarray(k[0])]
        stream = Bitstream(
            z_length=n_z,
            k=k_np,
            points_payload=points_payload,
            y_payload=y_payload,
            z_payload=z_payload,
            n_points=int(coords.shape[0]),
            depth=self.depth,
            caps=tuple(self.caps.caps),
            cand_factor=int(self.caps.cand_factor),
            tile_pct=int(round(self.caps.tile_fraction * 100)),
            same_tile_pct=int(round(self.caps.same_tile_fraction * 100)),
            post_tile_pct=int(round(self.caps.post_tile_fraction * 100)),
            stack_tile=int(self.caps.stack_tile),
            q_payload=q_payload,
            qz_payload=qz_payload,
            qz_length=n_qz,
        )
        if path is not None:
            stream.save(path)

        if not return_debug:
            return stream, {"n_y": n_y, "n_z": n_z}
        debug = {
            "y_hat": (v_y.astype(np.float32)
                      + np.asarray(means[0, :n_y], np.float32)),
            "q_hat": np.asarray(q_hat.feats[0, :n_y]) if q_hat is not None else None,
            "n_y": n_y,
            "n_z": n_z,
        }
        return stream, debug

    # -- decompress --

    def decompress(self, stream: Bitstream, return_debug: bool = False):
        """Returns (coords [N,3] int32, colors [N,3] float32 in [0,1])."""
        self._require_tables()
        # Self-contained stream: the header carries the capacity profile
        # the encoder compiled with; this codec must match it.
        if stream.caps and any(stream.caps) and tuple(stream.caps) != tuple(
            self.caps.caps
        ):
            raise ValueError(
                f"stream was encoded with capacity profile {tuple(stream.caps)} "
                f"but this codec was built with {tuple(self.caps.caps)}; "
                "construct the decoder via codec_for_stream()/"
                "Capacities(caps=stream.caps)."
            )
        mark = _phase_marks("decompress")
        # Latent coordinates.
        grid = octree_decode(
            stream.points_payload, self.depth - 3, self.caps.cap(LATENT_STRIDE)
        )
        y_xyz = grid * LATENT_STRIDE
        n_y = y_xyz.shape[0]
        cap8 = self.caps.cap(LATENT_STRIDE)
        pc = np.zeros((1, cap8, 3), np.int32)
        pv = np.zeros((1, cap8), bool)
        pc[0, :n_y] = y_xyz
        pv[0, :n_y] = True
        y_coords = from_coords(
            jnp.asarray(pc), jnp.zeros((1, cap8, 0), jnp.float32), jnp.asarray(pv),
            stride=LATENT_STRIDE,
        )
        mark("octree+coords upload")

        # z stream.
        n_z = stream.z_length
        ch = self.z_medians.shape[0]
        z_vals = rans_decode(
            stream.z_payload, _channel_indexes(n_z, ch), self.tables_z
        ).reshape(n_z, ch)
        # int16 wire + device-side median add (the encoder's z_hat_fn):
        # 4x smaller tunnel upload than f32, bit-identical result (one
        # IEEE f32 add of integer-exact operands on either side). Rare
        # bypass-coded outliers beyond int16 fall back to the f32 wire.
        if np.abs(z_vals).max(initial=0) <= 32000:
            z_pad = np.zeros((1, self.caps.cap(Z_STRIDE), ch), np.int16)
            z_pad[0, :n_z] = z_vals.astype(np.int16)
        else:
            z_pad = np.zeros((1, self.caps.cap(Z_STRIDE), ch), np.float32)
            z_pad[0, :n_z] = z_vals.astype(np.float32)
        z_hat_dev = self._z_hat(
            jnp.asarray(z_pad), jnp.asarray([n_z], jnp.int32),
            jnp.asarray(self.z_medians, jnp.float32),
        )

        mark("rans_z")
        scales, means, indexes, q_hat = self._decode_params(
            self.params, y_coords, z_hat_dev
        )
        mark("decode_params dispatch")

        # y stream: only the uint8 indexes come down and only int8
        # residuals (+ escape list) go back up; the f32 add happens on
        # device (the same IEEE f32 add as the host path — integer-exact
        # values + means on every carrier width). decode_params already
        # returns indexes as uint8 (see decode_params_fn).
        idx_np = np.asarray(indexes[0, :n_y]).astype(np.int32)
        mark("decode_params block+idx fetch")
        cb = means.shape[-1]
        v_y = rans_decode(stream.y_payload, idx_np.ravel(), self.tables_y).reshape(n_y, cb)
        mark("rans_y")
        vmax = np.abs(v_y).max(initial=0)
        esc_rows, esc_cols = np.nonzero(np.abs(v_y) > 127)
        if vmax <= 32000 and len(esc_rows) <= ESC_CAP:
            # int8 carrier + escape list (mirrors the encoder's wire).
            v8_pad = np.zeros((1, cap8, cb), np.int8)
            v8_pad[0, :n_y] = np.clip(v_y, -127, 127).astype(np.int8)
            ep = np.zeros((1, 2 * ESC_CAP), np.int32)
            ep[0, :ESC_CAP] = -1
            n_esc = len(esc_rows)
            if n_esc:
                ep[0, :n_esc] = esc_rows * cb + esc_cols
                ep[0, ESC_CAP:ESC_CAP + n_esc] = v_y[esc_rows, esc_cols]
            y_hat = y_coords.with_feats(
                self._dequantize_y(jnp.asarray(v8_pad), jnp.asarray(ep),
                                   means, y_coords.valid)
            )
            y_hat_feats = None
        elif vmax <= 32000:
            v_pad = np.zeros((1, cap8, cb), np.int16)
            v_pad[0, :n_y] = v_y.astype(np.int16)
            y_hat = y_coords.with_feats(
                self._dequantize_y16(jnp.asarray(v_pad), means, y_coords.valid)
            )
            y_hat_feats = None
        else:
            means_np = np.asarray(means[0, :n_y], np.float32)
            y_hat_feats = v_y.astype(np.float32) + means_np
            y_hat_pad = np.zeros((1, cap8, cb), np.float32)
            y_hat_pad[0, :n_y] = y_hat_feats
            y_hat = y_coords.with_feats(jnp.asarray(y_hat_pad))

        # separate_q_model: decode the quality map from its own streams
        # (q_hat from the h_q-free decode_params is None in this mode).
        if self.model.separate_q_model:
            n_qz = stream.qz_length
            qch = self.qz_medians.shape[0]
            qz_vals = rans_decode(
                stream.qz_payload, _channel_indexes(n_qz, qch), self.tables_qz
            ).reshape(n_qz, qch)
            qz_pad = np.zeros((1, self.caps.cap(Z_STRIDE), qch), np.float32)
            qz_pad[0, :n_qz] = (
                qz_vals.astype(np.float32) + self.qz_medians[None, :]
            )
            _, q_means, q_idx, _ = self._decode_params_q(
                self.params, y_coords, jnp.asarray(qz_pad)
            )
            qm_np = np.asarray(q_means[0, :n_y], np.float32)
            qb = qm_np.shape[1]
            v_q = rans_decode(
                stream.q_payload,
                np.asarray(q_idx[0, :n_y], np.int32).ravel(), self.tables_y,
            ).reshape(n_y, qb)
            q_hat_pad = np.zeros((1, cap8, qb), np.float32)
            q_hat_pad[0, :n_y] = v_q.astype(np.float32) + qm_np
            q_hat = y_coords.with_feats(jnp.asarray(q_hat_pad))

        mark("y upload+dequantize dispatch")
        k = jnp.asarray([stream.k], jnp.int32)
        x_hat, ov_s = self._synthesis(self.params, y_hat, q_hat, k)
        # Compact output fetch: u16 coords + u8 colors (colors are
        # already 8-bit quantized on device, so u8 -> /255 is lossless).
        # Overflow flag, row count, and the padded outputs come down in
        # ONE bundled device_get (async prefetch on every leaf) instead
        # of four serialized tunnel syncs; the full-capacity fetch is
        # ~20% padding but saves the count round trip.
        if not hasattr(self, "_out_fn"):
            self._out_fn = jax.jit(lambda st: (
                st.coords.astype(jnp.uint16),
                jnp.round(st.feats * 255.0).astype(jnp.uint8),
            ))
        oc_dev, ocol_dev = self._out_fn(x_hat)
        mark("synthesis dispatch")
        ov_np, cnt_np, oc_np, ocol_np = jax.device_get(
            (ov_s, x_hat.count, oc_dev[0], ocol_dev[0])
        )
        mark("synthesis block+output fetch")
        if bool(ov_np[0]):
            msg = (
                "capacity overflow during decode: a candidate/tile buffer "
                f"filled up (caps={self.caps.caps}) — the reconstruction "
                "would silently drop points. Decode with a larger profile."
            )
            if self.strict_overflow:
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg)
        n_out = int(cnt_np[0])
        out_coords = oc_np[:n_out].astype(np.int32)
        out_colors = ocol_np[:n_out].astype(np.float32) / 255.0
        if return_debug:
            if y_hat_feats is None:
                y_hat_feats = np.asarray(y_hat.feats[0, :n_y], np.float32)
            debug = {
                "y_hat": y_hat_feats,
                "q_hat": np.asarray(q_hat.feats[0, :n_y]) if q_hat is not None else None,
                "n_y": n_y,
                "n_z": n_z,
            }
            return (out_coords, out_colors), debug
        return out_coords, out_colors

    # -- batched multi-frame encode/decode (SURVEY §2.3: eval-side data
    #    parallelism — N frames through ONE batched device sweep, host
    #    loop only for the per-item rANS/octree streams) --

    def _shard(self, tree, mesh):
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec

        def put(leaf):
            spec = PartitionSpec("data", *([None] * (leaf.ndim - 1)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(put, tree)

    def compress_batch(self, frames, qs, mesh=None):
        """frames: [(coords, colors), ...] sharing this codec's capacity
        profile; qs: one (q_g, q_a) tuple or a list per frame;
        mesh: optional 1-axis ("data") jax Mesh — the batch axis shards
        across it (B must be divisible by mesh size).

        Returns a list of Bitstream. The analysis / hyper / parameter
        sweeps run ONCE over the whole batch.
        """
        self._require_tables()
        B = len(frames)
        cap = self.caps.cap(1)
        if not isinstance(qs, list):
            qs = [qs] * B
        pc = np.zeros((B, cap, 3), np.int32)
        pf = np.zeros((B, cap, 3), np.float32)
        pv = np.zeros((B, cap), bool)
        for b, (coords, colors) in enumerate(frames):
            n = coords.shape[0]
            if n > cap:
                raise ValueError(f"frame {b} has {n} points, capacity {cap}")
            pc[b, :n], pf[b, :n], pv[b, :n] = coords, colors, True
        x = from_coords(jnp.asarray(pc), jnp.asarray(pf), jnp.asarray(pv))
        qf = jnp.stack(
            [jnp.full((cap,), qg, jnp.float32) for (qg, _qa) in qs]
        )[..., None]
        qa = jnp.stack(
            [jnp.full((cap,), qa_, jnp.float32) for (_qg, qa_) in qs]
        )[..., None]
        q_st = x.with_feats(
            jnp.where(x.valid[..., None], jnp.concatenate([qf, qa], -1), 0.0)
        )
        x = self._shard(x, mesh)
        q_st = self._shard(q_st, mesh)

        y, q_latent, k, ov_a = self._analysis(self.params, x, q_st)
        z_vals_dev, z_count_dev, ov_z = self._encode_z(self.params, y)
        if self.strict_overflow and (
            bool(np.asarray(ov_a).any()) or bool(np.asarray(ov_z).any())
        ):
            raise RuntimeError(
                f"capacity overflow during batched encode (caps={self.caps.caps})"
            )

        # Device-side ẑ feeds decode_params directly (bitwise identical
        # to the host add — see _z_hat); the z ints come down only for
        # the per-item rANS payloads, overlapping the device sweep.
        z_hat_dev = self._z_hat(z_vals_dev, z_count_dev,
                                jnp.asarray(self.z_medians))
        y_coords = self._coords_st(y.keys, y.count, LATENT_STRIDE)
        scales, means, indexes, q_hat = self._decode_params(
            self.params, y_coords, z_hat_dev
        )

        # Host: per-item z streams.
        z_counts = np.asarray(z_count_dev)
        z_np = np.asarray(z_vals_dev)
        ch = z_np.shape[-1]
        z_payloads = []
        for b in range(B):
            n_z = int(z_counts[b])
            vals = z_np[b, :n_z].astype(np.int32)
            z_payloads.append(
                rans_encode(vals.ravel(), _channel_indexes(n_z, ch), self.tables_z)
            )

        means_np = np.asarray(means, np.float32)
        idx_np = np.asarray(indexes, np.int32)
        y_np = np.asarray(y.feats, np.float32)
        y_counts = np.asarray(y.count)
        k_np = np.asarray(k)

        # separate_q_model ablation: batched qz sweep + per-item q/qz
        # rANS streams (mirrors the single-frame path,
        # /root/reference/model/model.py:129-135,242-263).
        q_extras = [{"q_payload": b"", "qz_payload": b"", "qz_length": 0}
                    for _ in range(B)]
        if self.model.separate_q_model:
            qz_vals_dev, qz_count_dev, _ = self._encode_qz(self.params, q_latent)
            qz_counts = np.asarray(qz_count_dev)
            qz_np = np.asarray(qz_vals_dev)
            qch = self.qz_medians.shape[0]
            capz = self.caps.cap(Z_STRIDE)
            qz_pad = np.zeros((B, capz, qch), np.float32)
            for b in range(B):
                n_qz = int(qz_counts[b])
                qz_pad[b, :n_qz] = (qz_np[b, :n_qz].astype(np.float32)
                                    + self.qz_medians[None, :])
            y_coords_q = self._coords_st(y.keys, y.count, LATENT_STRIDE)
            _, q_means, q_idx, _ = self._decode_params_q(
                self.params, y_coords_q, jnp.asarray(qz_pad)
            )
            q_feats_np = np.asarray(q_latent.feats, np.float32)
            qm_np = np.asarray(q_means, np.float32)
            qi_np = np.asarray(q_idx, np.int32)
            for b in range(B):
                n_qz = int(qz_counts[b])
                n_y = int(y_counts[b])
                qz_vals = qz_np[b, :n_qz].astype(np.int32)
                v_q = np.round(q_feats_np[b, :n_y]
                               - qm_np[b, :n_y]).astype(np.int32)
                q_extras[b] = {
                    "q_payload": rans_encode(
                        v_q.ravel(), qi_np[b, :n_y].ravel(), self.tables_y),
                    "qz_payload": rans_encode(
                        qz_vals.ravel(), _channel_indexes(n_qz, qch),
                        self.tables_qz),
                    "qz_length": n_qz,
                }

        streams = []
        for b in range(B):
            n_y = int(y_counts[b])
            v_y = np.round(y_np[b, :n_y] - means_np[b, :n_y]).astype(np.int32)
            y_payload = rans_encode(
                v_y.ravel(), idx_np[b, :n_y].ravel(), self.tables_y
            )
            y_xyz = np.asarray(C.unpack(y.keys[b, :n_y]))
            points_payload = octree_encode(y_xyz // LATENT_STRIDE, self.depth - 3)
            streams.append(Bitstream(
                **q_extras[b],
                z_length=int(z_counts[b]),
                k=[int(v) for v in k_np[b]],
                points_payload=points_payload,
                y_payload=y_payload,
                z_payload=z_payloads[b],
                n_points=int(frames[b][0].shape[0]),
                depth=self.depth,
                caps=tuple(self.caps.caps),
                cand_factor=int(self.caps.cand_factor),
                tile_pct=int(round(self.caps.tile_fraction * 100)),
                same_tile_pct=int(round(self.caps.same_tile_fraction * 100)),
                post_tile_pct=int(round(self.caps.post_tile_fraction * 100)),
                stack_tile=int(self.caps.stack_tile),
            ))
        return streams

    def decompress_batch(self, streams, mesh=None):
        """Inverse of compress_batch: decode N streams with ONE batched
        parameter sweep + synthesis. Returns [(coords, colors), ...]."""
        self._require_tables()
        B = len(streams)
        cap8 = self.caps.cap(LATENT_STRIDE)
        capz = self.caps.cap(Z_STRIDE)
        ch = self.z_medians.shape[0]
        pc = np.zeros((B, cap8, 3), np.int32)
        pv = np.zeros((B, cap8), bool)
        z_hat_pad = np.zeros((B, capz, ch), np.float32)
        n_ys = []
        for b, stream in enumerate(streams):
            grid = octree_decode(stream.points_payload, self.depth - 3, cap8)
            n_y = grid.shape[0]
            n_ys.append(n_y)
            pc[b, :n_y] = grid * LATENT_STRIDE
            pv[b, :n_y] = True
            n_z = stream.z_length
            z_vals = rans_decode(
                stream.z_payload, _channel_indexes(n_z, ch), self.tables_z
            ).reshape(n_z, ch)
            z_hat_pad[b, :n_z] = z_vals.astype(np.float32) + self.z_medians[None, :]
        y_coords = from_coords(
            jnp.asarray(pc), jnp.zeros((B, cap8, 0), jnp.float32),
            jnp.asarray(pv), stride=LATENT_STRIDE,
        )
        y_coords = self._shard(y_coords, mesh)
        scales, means, indexes, q_hat = self._decode_params(
            self.params, y_coords, self._shard(jnp.asarray(z_hat_pad), mesh)
        )
        means_np = np.asarray(means, np.float32)
        idx_np = np.asarray(indexes, np.int32)
        cb = means_np.shape[-1]
        y_hat_pad = np.zeros((B, cap8, cb), np.float32)
        for b, stream in enumerate(streams):
            n_y = n_ys[b]
            v_y = rans_decode(
                stream.y_payload, idx_np[b, :n_y].ravel(), self.tables_y
            ).reshape(n_y, cb)
            y_hat_pad[b, :n_y] = v_y.astype(np.float32) + means_np[b, :n_y]
        y_hat = y_coords.with_feats(self._shard(jnp.asarray(y_hat_pad), mesh))

        # separate_q_model: reconstruct the quality map from its own
        # batched qz sweep + per-item q streams (q_hat from the
        # h_q-free decode_params is None in this mode).
        if self.model.separate_q_model:
            qch = self.qz_medians.shape[0]
            qz_pad = np.zeros((B, capz, qch), np.float32)
            for b, stream in enumerate(streams):
                n_qz = stream.qz_length
                qz_vals = rans_decode(
                    stream.qz_payload, _channel_indexes(n_qz, qch),
                    self.tables_qz,
                ).reshape(n_qz, qch)
                qz_pad[b, :n_qz] = (qz_vals.astype(np.float32)
                                    + self.qz_medians[None, :])
            _, q_means, q_idx, _ = self._decode_params_q(
                self.params, y_coords, self._shard(jnp.asarray(qz_pad), mesh)
            )
            qm_np = np.asarray(q_means, np.float32)
            qi_np = np.asarray(q_idx, np.int32)
            qb = qm_np.shape[-1]
            q_hat_pad = np.zeros((B, cap8, qb), np.float32)
            for b, stream in enumerate(streams):
                n_y = n_ys[b]
                v_q = rans_decode(
                    stream.q_payload, qi_np[b, :n_y].ravel(), self.tables_y
                ).reshape(n_y, qb)
                q_hat_pad[b, :n_y] = v_q.astype(np.float32) + qm_np[b, :n_y]
            q_hat = y_coords.with_feats(self._shard(jnp.asarray(q_hat_pad), mesh))

        k = jnp.asarray([s.k for s in streams], jnp.int32)
        x_hat, ov_s = self._synthesis(self.params, y_hat, q_hat, k)
        if self.strict_overflow and bool(np.asarray(ov_s).any()):
            raise RuntimeError(
                f"capacity overflow during batched decode (caps={self.caps.caps})"
            )
        out = []
        counts = np.asarray(x_hat.count)
        coords_np = np.asarray(x_hat.coords)
        colors_np = np.asarray(x_hat.feats)
        for b in range(B):
            n = int(counts[b])
            out.append((coords_np[b, :n], colors_np[b, :n]))
        return out

    # -- timing harness (/root/reference/utils.py:418-472) --

    def timed_roundtrip(self, coords, colors, q):
        t0 = time.perf_counter()
        stream, _ = self.compress(coords, colors, q, return_debug=False)
        jax.effects_barrier()
        t1 = time.perf_counter()
        out = self.decompress(stream)
        jax.effects_barrier()
        t2 = time.perf_counter()
        nbytes = len(stream.to_bytes())
        bpp = nbytes * 8.0 / coords.shape[0]
        return {
            "t_compress": t1 - t0,
            "t_decompress": t2 - t1,
            "bpp": bpp,
            "bytes": nbytes,
            "reconstruction": out,
        }
