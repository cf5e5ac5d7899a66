"""Training subsystem tests: step correctness, schedule, checkpoint, DP parity."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lwsnet_tpu import LWSNet, MeshConfig, ModelConfig, TrainConfig
from lwsnet_tpu.parallel import mesh as mesh_lib
from lwsnet_tpu.training import (CheckpointManager, create_train_state,
                                 make_eval_step, make_lr_schedule,
                                 make_train_step)

CFG = ModelConfig(compute_dtype="float32")
H, W, B = 32, 64, 8


def synth_batch(seed=0, b=B):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((b, H, W, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, H, W, 3)), jnp.float32),
        jnp.asarray(rng.uniform(1.0, 100.0, (b, H, W)), jnp.float32),
    )


@pytest.fixture(scope="module")
def setup():
    model = LWSNet(CFG)
    tcfg = TrainConfig(lr=1e-3, mask_max_disp=192.0)
    state = create_train_state(model, tcfg, jax.random.PRNGKey(0), (H, W),
                               steps_per_epoch=10)
    return model, tcfg, state


def test_train_step_reduces_loss(setup):
    model, tcfg, state = setup
    step = make_train_step(model, tcfg, steps_per_epoch=10, donate=False)
    l, r, g = synth_batch()
    losses = []
    for _ in range(8):
        state, aux = step(state, l, r, g)
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_frozen_bn_mode(setup):
    """bn_mode='frozen': the loss descends, batch_stats do NOT change, and
    the in-step loss is the true loss of the carried params (recomputing it
    with a fresh eval-mode apply agrees) — the property batch-mode BN loses
    on a repeated tiny batch (TrainConfig.bn_mode docstring)."""
    model, _, state = setup
    tcfg = TrainConfig(lr=1e-3, mask_max_disp=192.0, bn_mode="frozen")
    step = make_train_step(model, tcfg, steps_per_epoch=10, donate=False)
    l, r, g = synth_batch()
    stats0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.batch_stats)
    losses = []
    for _ in range(6):
        state, aux = step(state, l, r, g)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], losses
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 state.batch_stats, stats0)

    # recomputed loss of the carried state == the next step's in-step loss
    from lwsnet_tpu.training import losses as L
    outs = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats}, l, r, train=False)
    total, _ = L.staged_loss(outs, g, tcfg.loss_weights,
                             max_disp=tcfg.mask_max_disp)
    _, aux = step(state, l, r, g)
    np.testing.assert_allclose(float(total), float(aux["loss"]), rtol=1e-5)


def test_stat_step_refreshes_stats_only(setup):
    """make_stat_step (precise-BN re-estimation) updates running statistics
    and leaves params/opt_state/step untouched."""
    from lwsnet_tpu.training.steps import make_stat_step
    model, _, state = setup
    l, r, _ = synth_batch()
    stat_step = make_stat_step(model)
    new = stat_step(state, l, r)
    assert int(new.step) == int(state.step)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), new.params, state.params)
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        new.batch_stats, state.batch_stats))
    assert any(changed)


def test_lr_schedule_milestones():
    tcfg = TrainConfig(lr=5e-4, lr_milestones=(200, 400), lr_gamma=0.1)
    sched = make_lr_schedule(tcfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1999)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(2000)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(4000)), 5e-6, rtol=1e-6)
    # pretrain: constant (reference: train.py:80)
    sched2 = make_lr_schedule(TrainConfig(lr=5e-4), 10)
    np.testing.assert_allclose(float(sched2(10 ** 6)), 5e-4, rtol=1e-6)


def test_lr_schedule_warmup():
    """Linear 0 -> lr ramp over warmup_steps, then the base schedule
    (new capability beyond the reference — see make_lr_schedule docstring
    for the fresh-Adam-on-trained-params failure it prevents)."""
    tcfg = TrainConfig(lr=4e-4, warmup_steps=16)
    sched = make_lr_schedule(tcfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(sched(8)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(16)), 4e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), 4e-4, rtol=1e-6)
    # warmup composes with milestones (decay boundaries shift past it)
    tcfg2 = TrainConfig(lr=4e-4, warmup_steps=16, lr_milestones=(5,),
                        lr_gamma=0.5)
    sched2 = make_lr_schedule(tcfg2, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched2(16)), 4e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched2(80)), 2e-4, rtol=1e-6)


def test_nonfinite_step_applies_no_update(setup):
    """A NaN batch must leave params, optimizer state, AND batch-norm running
    stats untouched (one poisoned BN stat corrupts every later eval)."""
    model, tcfg, state = setup
    step = make_train_step(model, tcfg, steps_per_epoch=10, donate=False)
    l, r, g = synth_batch()
    state1, _ = step(state, l, r, g)  # one good step to settle state

    bad_l = l.at[0, 0, 0, 0].set(jnp.nan)
    state2, aux = step(state1, bad_l, r, g)
    assert float(aux["finite"]) == 0.0
    for a, b in zip(jax.tree.leaves((state1.params, state1.opt_state,
                                     state1.batch_stats)),
                    jax.tree.leaves((state2.params, state2.opt_state,
                                     state2.batch_stats))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state2.step) == int(state1.step) + 1  # schedule still advances

    # ... and a following good step proceeds normally from intact state.
    state3, aux3 = step(state2, l, r, g)
    assert float(aux3["finite"]) == 1.0
    assert np.isfinite(float(aux3["loss"]))


def test_grad_clip_bounds_update_norm(setup):
    """With grad_clip_norm set, the post-clip update magnitude is bounded even
    when the raw gradient norm is huge (scaled-up GT inflates the loss)."""
    model, tcfg, state = setup
    clipped = make_train_step(model, TrainConfig(
        lr=1e-3, mask_max_disp=1e9, grad_clip_norm=1.0),
        steps_per_epoch=10, donate=False)
    l, r, g = synth_batch()
    state_c, aux = clipped(state, l, r, g * 1e4)
    assert float(aux["grad_norm"]) > 1.0  # raw norm really was over the clip
    delta = optax.global_norm(jax.tree.map(
        lambda a, b: a - b, state_c.params, state.params))
    # Adam normalizes per-parameter, so bound via the lr * sqrt(#leaves) worst
    # case rather than the clip norm itself; the point is: no blow-up.
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    assert float(delta) <= 1e-3 * math.sqrt(n_params) * 1.01


def test_eval_step_weights_padded_batches(setup):
    model, tcfg, state = setup
    estep = make_eval_step(model)
    l, r, g = synth_batch(1, b=4)
    valid = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    out = estep(state, l, r, g, valid)
    assert out["epe"].shape == (4,)  # per stage
    assert float(out["weight"]) == 2.0
    # padded rows must not contribute: zeroing them changes nothing
    l2 = l.at[2:].set(0.0)
    out2 = estep(state, l2, r, g, valid)
    np.testing.assert_allclose(np.asarray(out["epe"]),
                               np.asarray(out2["epe"]), rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path, setup):
    model, tcfg, state = setup
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    meta = {"epoch": 3, "lr": 5e-4, "error": 1.23, "time_cost": 42.0}
    mgr.save(jax.device_get(state), meta)

    template = jax.tree.map(jnp.zeros_like, state)
    restored, meta2 = mgr.restore(template)
    assert meta2["epoch"] == 3.0
    assert abs(meta2["error"] - 1.23) < 1e-9
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    only = mgr.restore_params_only(template)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(only.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))
    assert int(only.step) == 0  # fresh optimizer/step

    missing = CheckpointManager(str(tmp_path / "nope"))
    assert missing.restore(template) == (None, {})


def test_dp_matches_single_device(setup):
    """The 8-way sharded train step must produce the same loss and params as
    the single-device step on the same global batch (GSPMD inserts the
    all-reduce; BN stats are global either way)."""
    model, tcfg, state0 = setup
    step = make_train_step(model, tcfg, steps_per_epoch=10, donate=False)
    l, r, g = synth_batch(2)

    # single device
    s1, aux1 = step(state0, l, r, g)

    # 8-way data parallel
    mcfg = MeshConfig()
    mesh = mesh_lib.make_mesh(mcfg)
    state_r = mesh_lib.replicate_state(mesh, state0)
    sharded = mesh_lib.shard_batch(
        mesh, {"l": np.asarray(l), "r": np.asarray(r), "g": np.asarray(g)},
        mcfg)
    s8, aux8 = step(state_r, sharded["l"], sharded["r"], sharded["g"])

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=1e-5)
    # Post-Adam params can differ by +-2*lr on near-zero-gradient elements
    # (sign(g) amplification of reduction-order noise), so compare gradients
    # directly instead: the all-reduced gradient must match single-device.
    from lwsnet_tpu.training import losses as loss_lib

    def grad_of(params, stats, left, right, gt):
        def f(p):
            outs, _ = model.apply({"params": p, "batch_stats": stats},
                                  left, right, train=True,
                                  mutable=["batch_stats"])
            total, _ = loss_lib.staged_loss(outs, gt, tcfg.loss_weights,
                                            max_disp=tcfg.mask_max_disp)
            return total
        return jax.jit(jax.grad(f))(params)

    g1 = grad_of(state0.params, state0.batch_stats, l, r, g)
    g8 = grad_of(state_r.params, state_r.batch_stats,
                 sharded["l"], sharded["r"], sharded["g"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a), 1e-3)
        assert np.max(np.abs(a - b) / denom) < 1e-3

    # And the params that did move agree to within the Adam quantum.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.5e-3)


def test_spatial_sharding_matches_data_parallel(setup):
    """A 4x2 data x spatial mesh (image rows sharded; GSPMD halo exchanges)
    must reproduce the pure-DP step."""
    model, tcfg, state0 = setup
    step = make_train_step(model, tcfg, steps_per_epoch=10, donate=False)
    l, r, g = synth_batch(3)
    batch = {"l": np.asarray(l), "r": np.asarray(r), "g": np.asarray(g)}

    mcfg_dp = MeshConfig()
    mesh_dp = mesh_lib.make_mesh(mcfg_dp)
    sh_dp = mesh_lib.shard_batch(mesh_dp, batch, mcfg_dp)
    _, aux_dp = step(mesh_lib.replicate_state(mesh_dp, state0),
                     sh_dp["l"], sh_dp["r"], sh_dp["g"])

    mcfg_sp = MeshConfig(spatial_parallel=2)
    mesh_sp = mesh_lib.make_mesh(mcfg_sp)
    sh_sp = mesh_lib.shard_batch(mesh_sp, batch, mcfg_sp)
    assert sh_sp["l"].sharding.spec == ("data", "spatial", None, None)
    _, aux_sp = step(mesh_lib.replicate_state(mesh_sp, state0),
                     sh_sp["l"], sh_sp["r"], sh_sp["g"])

    np.testing.assert_allclose(float(aux_dp["loss"]), float(aux_sp["loss"]),
                               rtol=1e-5)


def test_graft_entry_dryrun():
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)
