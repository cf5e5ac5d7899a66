"""Jitted train/eval steps, sharding-aware.

One fused XLA program per step (forward, loss, backward, Adam update, BN
running-stat update), the jit-end-to-end equivalent of the reference's
per-batch loop body (reference: train.py:134-155). Under a data mesh the same
step function is jitted with batch inputs sharded on the `data` axis and the
state replicated; XLA inserts the gradient all-reduce (and makes the
batch-norm batch statistics global — i.e. sync-BN) automatically.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from lwsnet_tpu.config import ModelConfig, TrainConfig
from lwsnet_tpu.models.lwsnet import LWSNet
from lwsnet_tpu.training import losses, metrics
from lwsnet_tpu.training.state import TrainState, make_lr_schedule, \
    make_optimizer


def make_train_step(model: LWSNet, cfg: TrainConfig,
                    steps_per_epoch: int,
                    donate: bool = True) -> Callable:
    """Returns train_step(state, left, right, gt) -> (state, aux).

    aux = {"loss": scalar, "stage_losses": (num_stages,) de-weighted,
           "lr": the learning rate this update used,
           "grad_norm": pre-clip global gradient norm,
           "finite": 1.0 iff this step's loss+grads were finite}  (the
    de-weighted per-stage values are what the reference logs,
    reference: train.py:150; the live lr is persisted in checkpoints,
    reference: train.py:117).

    When `cfg.skip_nonfinite_updates`, a step whose loss or gradients are
    non-finite applies NO update: params, optimizer state, and batch-norm
    running statistics all carry over unchanged (one NaN batch must not
    poison the BN running stats — they feed every eval forever after).
    """
    tx = make_optimizer(cfg, steps_per_epoch)
    schedule = make_lr_schedule(cfg, steps_per_epoch)

    assert cfg.bn_mode in ("batch", "frozen"), cfg.bn_mode

    def loss_fn(params, batch_stats, left, right, gt):
        if cfg.bn_mode == "batch":
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                left, right, train=True, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:  # "frozen": normalize by fixed running stats, no stat update
            outputs = model.apply(
                {"params": params, "batch_stats": batch_stats},
                left, right, train=False)
            new_stats = batch_stats
        total, per_stage = losses.staged_loss(
            outputs, gt, cfg.loss_weights,
            min_disp=cfg.mask_min_disp, max_disp=cfg.mask_max_disp)
        return total, (per_stage, new_stats)

    def train_step(state: TrainState, left, right, gt):
        (loss, (per_stage, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   left, right, gt)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # One scalar covers every leaf: any inf/nan gradient makes the
        # global norm non-finite; combined with the loss it gates the step.
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        if cfg.skip_nonfinite_updates:
            keep = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new, old)
            new_params = keep(new_params, state.params)
            new_opt = keep(new_opt, state.opt_state)
            new_stats = keep(new_stats, state.batch_stats)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt)
        aux = {"loss": loss, "stage_losses": per_stage,
               "lr": schedule(state.step), "grad_norm": grad_norm,
               "finite": finite.astype(jnp.float32)}
        return new_state, aux

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_stat_step(model: LWSNet) -> Callable:
    """Returns stat_step(state, left, right) -> state with refreshed BN
    running statistics (one forward pass in batch-stats mode, no parameter
    update) — the building block of precise-BN re-estimation
    (TrainConfig.bn_reestimate_batches)."""

    def stat_step(state: TrainState, left, right):
        _, mutated = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            left, right, train=True, mutable=["batch_stats"])
        return state.replace(batch_stats=mutated["batch_stats"])

    return jax.jit(stat_step)


def make_eval_step(model: LWSNet, max_disp: float = 192.0,
                   sceneflow_row_offset: int = 0) -> Callable:
    """Returns eval_step(state, left, right, gt, valid) ->
    {"epe": (stages,), "d1": (stages,), "weight": scalar}.

    Per-stage EPE and D1 summed over the *valid* examples of the batch
    (padded eval batches carry valid=0 rows); divide accumulated sums by
    accumulated weight on the host. `sceneflow_row_offset` reproduces the
    reference's `output[:, 4:, :]` eval crop where the 544-row prediction is
    compared against 540-row GT (reference: train.py:189).
    """

    def eval_step(state: TrainState, left, right, gt, valid):
        outputs = model.apply(state.variables, left, right, train=False)
        if sceneflow_row_offset:
            outputs = [o[:, sceneflow_row_offset:, :, :] for o in outputs]
        epes, d1s = [], []
        for o in outputs:
            o = o[..., 0]
            # per-example metrics, masked by validity
            def per_ex(pred, g):
                return metrics.epe(pred[None], g[None], max_disp), \
                       metrics.d1_error(pred[None], g[None], max_disp)
            e, d = jax.vmap(per_ex)(o, gt)
            epes.append(jnp.sum(e * valid))
            d1s.append(jnp.sum(d * valid))
        return {
            "epe": jnp.stack(epes),
            "d1": jnp.stack(d1s),
            "weight": jnp.sum(valid),
        }

    return jax.jit(eval_step)
