"""Train state: params + batch-norm stats + Adam optimizer state.

The reference uses Paddle Adam at lr 5e-4 (reference: train.py:80) and, for
finetune, MultiStepDecay(milestones=[200,400], gamma=0.1) stepped per epoch
(reference: finetune.py:82-84, :178). Here the schedule is a step-indexed
optax piecewise-constant schedule (epoch boundaries x steps-per-epoch), which
is the jit-friendly equivalent.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from lwsnet_tpu.config import ModelConfig, TrainConfig
from lwsnet_tpu.models.lwsnet import LWSNet


class TrainState(struct.PyTreeNode):
    """Pure pytree train state (no apply_fn closure — keeps it trivially
    shardable/checkpointable)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Piecewise-constant LR: lr * gamma^(#milestones passed), stepped at
    epoch boundaries (reference: finetune.py:82-84). Pretrain has no
    milestones -> constant lr (reference: train.py:80). An optional linear
    warmup over `cfg.warmup_steps` ramps 0 -> lr first: with a FRESH Adam
    on already-trained parameters, the bias-corrected first updates are
    ~lr * sign(g) on EVERY parameter at once — measured r5 to knock an
    overfit-proof checkpoint from 3.3 to 25 px in one epoch; a one-epoch
    ramp lets the moment estimates calibrate before full-size steps."""
    if not cfg.lr_milestones:
        base = optax.constant_schedule(cfg.lr)
    else:
        boundaries = {
            int(m) * steps_per_epoch: cfg.lr_gamma
            for m in cfg.lr_milestones
        }
        base = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    if cfg.warmup_steps <= 0:
        return base
    warm = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    return optax.join_schedules([warm, base], [cfg.warmup_steps])


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam with Paddle's defaults (b1=0.9, b2=0.999, eps=1e-8,
    reference: train.py:80), preceded by global-norm gradient clipping when
    `cfg.grad_clip_norm > 0` (see the TrainConfig field docs for why)."""
    adam = optax.adam(make_lr_schedule(cfg, steps_per_epoch))
    if cfg.grad_clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), adam)
    return adam


def create_train_state(model: LWSNet, cfg: TrainConfig,
                       rng: jax.Array, sample_shape: Tuple[int, int],
                       steps_per_epoch: int = 1000,
                       batch_size: int = 1) -> TrainState:
    """Initialize params/batch_stats with a dummy forward at `sample_shape`
    (shapes don't affect conv params, so any multiple-of-8 size works)."""
    h, w = sample_shape
    dummy = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, dummy, dummy, train=False)
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )


def param_count(state: TrainState) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(state.params))
