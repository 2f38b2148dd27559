"""Sharded training step: dual-optimizer RD training over a device mesh.

Replaces the reference's single-GPU loop body
(/root/reference/train.py:171-221). The two-optimizer convention is
kept: the main Adam(+StepLR, grad-clip) updates every parameter except
the entropy bottleneck ``quantiles``; a second Adam drives the
quantiles with the aux (tail-fitting) loss
(/root/reference/train.py:63-78,203-213).

The step is one jitted function over a data-parallel mesh: batch
arrays are sharded on axis 0, parameters replicated; XLA inserts the
gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.qmap import QMap
from ..ops import from_coords
from ..training.loss import Loss


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    aux_opt_state: Any
    step: jax.Array


def _is_quantile_path(path) -> bool:
    return any(getattr(k, "key", None) == "quantiles" for k in path)


def quantile_mask(params):
    return jax.tree_util.tree_map_with_path(lambda p, _: _is_quantile_path(p), params)


def main_optimizer(lr: float, scheduler_step: int, scheduler_gamma: float,
                   clip: float = 1.0, steps_per_epoch: int = 1):
    """Adam + StepLR(epoch granularity) + global-norm clip
    (/root/reference/train.py:63-78,203)."""
    sched = optax.exponential_decay(
        init_value=lr,
        transition_steps=scheduler_step * steps_per_epoch,
        decay_rate=scheduler_gamma,
        staircase=True,
    )
    return optax.chain(optax.clip_by_global_norm(clip), optax.adam(sched))


def create_train_state(
    model,
    params,
    lr: float = 1e-4,
    aux_lr: float = 1e-3,
    scheduler_step: int = 80,
    scheduler_gamma: float = 0.1,
    clip: float = 1.0,
    steps_per_epoch: int = 1,
) -> tuple[TrainState, optax.GradientTransformation, optax.GradientTransformation]:
    mask = quantile_mask(params)
    not_mask = jax.tree_util.tree_map(lambda b: not b, mask)
    opt = optax.masked(
        main_optimizer(lr, scheduler_step, scheduler_gamma, clip, steps_per_epoch),
        not_mask,
    )
    aux_opt = optax.masked(optax.adam(aux_lr), mask)
    state = TrainState(
        params=params,
        opt_state=opt.init(params),
        aux_opt_state=aux_opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    return state, opt, aux_opt


def make_train_step(
    model,
    loss_fn: Loss,
    qmap: QMap,
    opt: optax.GradientTransformation,
    aux_opt: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    space_bits: Optional[int] = None,
    rate_warmup_steps: int = 0,
    grad_accum: int = 1,
) -> Callable:
    """Build the jitted (and optionally mesh-sharded) train step.

    Step inputs: state, (coords [B,N,3], feats [B,N,3], valid [B,N]), rng.
    Returns (state, metrics dict).

    space_bits: static per-axis coordinate bound of the training data
    (7 for 128^3 cubes). Small spaces let every membership op in the
    step use dense rank-volume lookups (ops/coords.lookup_in) — the
    searchsorted path measured 2.5 s/step in the multiscale focal loss
    alone at batch 4 x 4096.

    rate_warmup_steps: ramp the BPP losses 0 -> 1 over this many steps
    (distortion-first training; round-4's flat ramp collapsed the y
    latent before the synthesis could use it). 0 = no warm-up.

    grad_accum: split the batch into this many micro-batches and
    accumulate gradients before the (single) optimizer update —
    recovers the reference's effective batch 8 under the 16 GB HBM
    ceiling that caps the fused step at batch 4 (VERDICT r4 #9).
    """
    from ..ops import coords as _C

    sb = _C.COORD_BITS if space_bits is None else int(space_bits)
    accum = max(1, int(grad_accum))

    def loss_on(params, coords, feats, valid, q_key, noise_key, step_i):
        x = from_coords(coords, feats, valid, space_bits=sb)
        q, lam = qmap(x, q_key)
        out = model.apply(params, x, q, lam, training=True,
                          rngs={"noise": noise_key})
        if rate_warmup_steps > 0:
            # Small floor: a literally-free rate phase lets y/z grow
            # arbitrarily entropic, which then fights the ramp-in.
            out["rate_scale"] = jnp.clip(
                step_i.astype(jnp.float32) / float(rate_warmup_steps), 0.02, 1.0)
        total, parts = loss_fn(x, out)
        return total, parts

    def step(state: TrainState, coords, feats, valid, rng):
        q_key, noise_key = jax.random.split(jax.random.fold_in(rng, state.step))

        if accum == 1:
            def objective(params):
                return loss_on(params, coords, feats, valid, q_key, noise_key,
                               state.step)

            (total, parts), grads = jax.value_and_grad(objective, has_aux=True)(
                state.params)
        else:
            B = coords.shape[0]
            mb = B // accum
            shaped = [a.reshape((accum, mb) + a.shape[1:])
                      for a in (coords, feats, valid)]

            def micro(carry, inputs):
                grads_acc, tot_acc, parts_acc = carry
                c, f, v, i = inputs
                kq = jax.random.fold_in(q_key, i)
                kn = jax.random.fold_in(noise_key, i)

                def objective(params):
                    return loss_on(params, c, f, v, kq, kn, state.step)

                (t, p), g = jax.value_and_grad(objective, has_aux=True)(
                    state.params)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                parts_acc = jax.tree_util.tree_map(jnp.add, parts_acc, p)
                return (grads_acc, tot_acc + t, parts_acc), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (t0, p0), g0 = jax.value_and_grad(
                lambda params: loss_on(params, shaped[0][0], shaped[1][0],
                                       shaped[2][0], jax.random.fold_in(q_key, 0),
                                       jax.random.fold_in(noise_key, 0),
                                       state.step),
                has_aux=True,
            )(state.params)
            idx = jnp.arange(1, accum)
            (grads, total, parts), _ = jax.lax.scan(
                micro, (g0, t0, p0),
                (shaped[0][1:], shaped[1][1:], shaped[2][1:], idx))
            inv = 1.0 / accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            total = total * inv
            parts = jax.tree_util.tree_map(lambda p: p * inv, parts)

        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        def aux_objective(params):
            return model.apply(params, method=type(model).aux_loss)

        aux, aux_grads = jax.value_and_grad(aux_objective)(params)
        aux_updates, aux_opt_state = aux_opt.update(aux_grads, state.aux_opt_state, params)
        params = optax.apply_updates(params, aux_updates)

        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            aux_opt_state=aux_opt_state,
            step=state.step + 1,
        )
        metrics = {"loss": total, "aux_loss": aux, **parts}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    # Shardings: state replicated, batch arrays sharded on axis 0.
    return jax.jit(
        step,
        in_shardings=(repl, bsh, bsh, bsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
