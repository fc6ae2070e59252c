"""Optimizer + schedules (optax).

Parity target: `/root/reference/src/optim.py` — torch optimizer picked by
name with a per-step learning rate injected before each step; 'warmup'
(4000) and 'decay' (1000) are both the Noam formula
``init_lr * w^0.5 * min((s+1) * w^-1.5, (s+1)^-0.5)`` (`:19-27`); teacher-
forcing rate schedule ``max(tf_end, tf_start - (tf_start-tf_end)*step/tf_step)``
(`:9`). Gradient clipping at global-norm 5.0 with NaN-step skipping comes
from the solver (`src/solver.py:138-151`) and is folded into the optax chain
here so the whole update is one fused device program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

GRAD_CLIP = 5.0  # `src/solver.py:21`


def apply_if_finite_masked(inner: optax.GradientTransformation):
    """`optax.apply_if_finite`, but with masked selects instead of `lax.cond`.

    Same semantics and the same state layout (optax.ApplyIfFiniteState, so
    checkpointed opt_states stay interchangeable): when any incoming grad
    leaf is non-finite the update is zeroed and the inner state is kept.
    The difference is purely how that's expressed: the captured train-step
    trace (tools/train_trace.py) shows optax's `lax.cond` costing ~1.3 ms
    per step as an unfused XLA conditional; per-leaf `jnp.where` fuses into
    the surrounding update math. The inner update always executes (its cost
    was paid on the hot all-finite path anyway)."""

    def init(params):
        return optax.ApplyIfFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            last_finite=jnp.array(True, jnp.bool_),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params))

    def update(updates, state, params=None):
        leaves = jax.tree_util.tree_leaves(updates)
        isfinite = jnp.array(True)
        for l in leaves:
            isfinite = jnp.logical_and(isfinite, jnp.all(jnp.isfinite(l)))
        new_updates, new_inner = inner.update(updates, state.inner_state, params)
        sel = lambda n, o: jnp.where(isfinite, n, o)
        return (
            jax.tree_util.tree_map(lambda u: sel(u, jnp.zeros_like(u)), new_updates),
            optax.ApplyIfFiniteState(
                notfinite_count=jnp.where(isfinite, 0, state.notfinite_count + 1),
                last_finite=isfinite,
                total_notfinite=state.total_notfinite + (1 - isfinite.astype(jnp.int32)),
                inner_state=jax.tree_util.tree_map(sel, new_inner, state.inner_state)),
        )

    return optax.GradientTransformation(init, update)


def noam_schedule(init_lr: float, warmup_step: float):
    def lr(step):
        s = step + 1.0
        return init_lr * warmup_step**0.5 * jnp.minimum(s * warmup_step**-1.5, s**-0.5)

    return lr


def make_lr_schedule(lr: float, lr_scheduler: str):
    if lr_scheduler == "warmup":
        return noam_schedule(lr, 4000.0)
    if lr_scheduler == "decay":
        return noam_schedule(lr, 1000.0)
    return lambda step: lr  # 'fixed'


def tf_rate_schedule(tf_start=1.0, tf_end=1.0, tf_step=1):
    return lambda step: max(tf_end, tf_start - (tf_start - tf_end) * step / tf_step)


_OPTAX_BY_TORCH_NAME = {
    "adam": optax.scale_by_adam,
    "adamw": optax.scale_by_adam,  # weight decay added below
    "rmsprop": optax.scale_by_rms,
    "sgd": lambda: optax.identity(),
    "adadelta": optax.scale_by_adadelta,
}


def make_optimizer(optimizer: str = "Adam", lr: float = 1e-3, lr_scheduler: str = "decay",
                   weight_decay: float = 0.0, **unused):
    """Returns (optax.GradientTransformation, lr_schedule_fn).

    Chain: clip_by_global_norm(5) -> (adam|...) -> scheduled lr -> NaN-step
    skip (the reference skips `opt.step()` when the grad norm is NaN).
    """
    name = optimizer.lower()
    if name not in _OPTAX_BY_TORCH_NAME:
        raise NotImplementedError(f"optimizer {optimizer}")
    schedule = make_lr_schedule(lr, lr_scheduler)
    chain = [optax.clip_by_global_norm(GRAD_CLIP), _OPTAX_BY_TORCH_NAME[name]()]
    if name == "adamw" and weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    tx = apply_if_finite_masked(tx)
    return tx, schedule


def advance_lr_schedule(opt_state, step: int):
    """Fast-forward the LR schedule count of a FRESH opt_state to ``step``.

    Used when resuming from an imported reference checkpoint
    (train/torch_import.py): torch Adam moments cannot be carried over, so
    the optimizer restarts from ``tx.init`` — but the Noam schedule count
    lives in the opt_state too (`optax.ScaleByScheduleState`), and leaving
    it at 0 would silently restart warmup, ramping a converged model back to
    peak LR at step ``warmup`` (`src/optim.py:19-27` has no such reset: the
    reference recomputes lr from the carried global_step every step).

    Only the schedule count is advanced. The Adam count deliberately stays 0:
    its moments ARE fresh zeros, and the count's sole job is bias-correcting
    those moments' zero-initialization — advancing it with empty moments
    would skip the correction and scale the first updates wrongly.
    """

    def fix(node):
        if isinstance(node, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.asarray(step, dtype=node.count.dtype))
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # namedtuple
            return type(node)(*(fix(v) for v in node))
        if isinstance(node, (tuple, list)):
            return type(node)(fix(v) for v in node)
        if isinstance(node, dict):
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(opt_state)


def global_norm(grads):
    return optax.global_norm(grads)


class Optimizer:
    """Thin reference-shaped facade (`src/optim.py:4-54`) over the optax
    transformation, for solvers that want the pre_step/step API."""

    def __init__(self, optimizer="Adam", lr=1e-3, lr_scheduler="decay",
                 tf_start=1.0, tf_end=1.0, tf_step=1,
                 recon_init_weight=1.0, recon_decay=0.0, **kwargs):
        self.opt_type, self.sch_type = optimizer, lr_scheduler
        self.tf_type = tf_end != 1
        self.recon_sch = recon_init_weight != 1.0
        self.tx, self.lr_fn = make_optimizer(optimizer, lr, lr_scheduler)
        self.tf_rate = tf_rate_schedule(tf_start, tf_end, tf_step)
        self._recon_init, self._recon_decay = recon_init_weight, recon_decay

    def init(self, params):
        return self.tx.init(params)

    def pre_step(self, step):
        return self.tf_rate(step)

    def recon_rate(self, step):
        # reference quirk: its method shadowed the schedule lambda
        # (`src/optim.py:11` vs `:49-50`); this is the intended decay
        return max(1.0, self._recon_init - (self._recon_init - 1.0)
                   * step / max(self._recon_decay, 1.0))

    def create_msg(self):
        return ["Optim.spec.| Algo. = {}\t| Lr/sampling/rec.loss scheduler = {}/{}/{}".format(
            self.opt_type, self.sch_type, self.tf_type, self.recon_sch)]
