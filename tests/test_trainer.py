"""End-to-end Trainer tests on a tiny synthetic KITTI-style corpus.

Covers the full epoch machinery the step-level tests stop short of
(reference loops: train.py:107-199, finetune.py:122-210): loss decreases over
`fit`, best-only checkpoints carry the live lr, resume restores
epoch/error/time, and the epoch->step milestone conversion uses *per-host*
batch counts (the r1 multi-host schedule bug).
"""

import logging
import math
import os

import numpy as np
import pytest
from lwsnet_tpu.data.png import write_png

from lwsnet_tpu import ModelConfig, TrainConfig
from lwsnet_tpu.data.kitti2015 import StereoIndex
from lwsnet_tpu.data.pipeline import StereoPipeline
from lwsnet_tpu.training.loop import Trainer, TrainerConfig

H, W = 64, 96           # synthetic image size
CROP = (32, 64)         # train crop and eval window
N_EXAMPLES = 16  # batch 8 keeps the global batch divisible by the 8-device mesh


def _write_corpus(root) -> StereoIndex:
    rng = np.random.default_rng(0)
    lefts, rights, disps = [], [], []
    for i in range(N_EXAMPLES):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        # right = left shifted a few px: gives the loss something learnable
        right = np.roll(img, -3, axis=1)
        disp = rng.uniform(3.0, 40.0, (H, W)).astype(np.float32)
        lp, rp, dp = (os.path.join(root, f"{n}_{i}.png")
                      for n in ("l", "r", "d"))
        write_png(lp, img)
        write_png(rp, right)
        # KITTI GT format: uint16 = disp * 256 (reference: dataloader.py:54-56)
        write_png(dp, (disp * 256).astype(np.uint16))
        lefts.append(lp); rights.append(rp); disps.append(dp)
    return StereoIndex(lefts, rights, disps)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return _write_corpus(str(root))


def _make_trainer(corpus, save_path, milestones=()):
    mcfg = ModelConfig(compute_dtype="float32")
    tcfg = TrainConfig(
        lr=1e-3, epochs=2, train_batch_size=8, eval_batch_size=8,
        lr_milestones=milestones, lr_gamma=0.1, mask_min_disp=0.0,
        save_path=save_path, log_every=1)
    train_pipe = StereoPipeline(corpus, 8, training=True, crop=CROP,
                                kitti=True, num_workers=2)
    eval_pipe = StereoPipeline(corpus, 8, training=False, crop=CROP,
                               kitti=True, num_workers=2)
    log = logging.getLogger("test_trainer")
    return Trainer(TrainerConfig(model=mcfg, train=tcfg, eval_metric="epe"),
                   train_pipe, eval_pipe, log)


def test_fit_learns_checkpoints_and_resumes(corpus, tmp_path):
    save = str(tmp_path / "run")
    trainer = _make_trainer(corpus, save, milestones=(1,))
    assert trainer.steps_per_epoch == 2  # 16 examples / batch 8, PER HOST

    # record every step's loss through a wrapper
    step_losses = []
    orig = trainer.train_step

    def spy(state, l, r, g):
        state, aux = orig(state, l, r, g)
        step_losses.append(float(aux["loss"]))
        return state, aux

    trainer.train_step = spy
    error = trainer.fit(epochs=2)

    assert len(step_losses) == 4 and all(np.isfinite(step_losses))
    assert step_losses[-1] < step_losses[0], step_losses
    assert math.isfinite(error)
    assert int(trainer.state.step) == 4

    # milestone at epoch 1 -> the decay fires at optimizer step 2 = 1 epoch
    # of PER-HOST batches; trainer.last_lr is the live schedule value.
    np.testing.assert_allclose(trainer.last_lr, 1e-4, rtol=1e-6)

    # best-only checkpoint exists and a fresh trainer resumes from it
    # (the checkpoint holds the BEST epoch's state, which need not be the
    # final one, so compare against the fresh init instead of trainer.state)
    import jax
    trainer2 = _make_trainer(corpus, save, milestones=(1,))
    trainer2.init_state()
    fresh = np.asarray(jax.tree.leaves(trainer2.state.params)[0]).copy()
    assert trainer2.resume()
    assert trainer2.start_epoch >= 1
    assert trainer2.best_error == trainer.best_error
    restored = np.asarray(jax.tree.leaves(trainer2.state.params)[0])
    assert not np.array_equal(fresh, restored)  # trained params were loaded
    assert int(trainer2.state.step) >= trainer.steps_per_epoch


def test_evaluate_runs_standalone(corpus, tmp_path):
    trainer = _make_trainer(corpus, str(tmp_path / "run2"))
    trainer.init_state()
    err = trainer.evaluate()  # --evaluate mode (reference: finetune.py:115-117)
    assert math.isfinite(err) and err >= 0.0


def test_orbax_backend_trainer_roundtrip(corpus, tmp_path, monkeypatch):
    """The Trainer's save path must work through the ORBAX backend with the
    mesh-replicated (sharded jax.Array) state — the r3 VERDICT flagged that
    an external process_index()==0 gate around ckpt.save would deadlock
    multi-host orbax saves, so the gate now lives inside the backends and
    fit() passes the live sharded state straight to save."""
    from lwsnet_tpu.training import checkpoint as ckpt_lib

    if not ckpt_lib._orbax_importable():
        pytest.skip("orbax not importable in this environment")
    monkeypatch.setenv("LWSNET_CKPT_BACKEND", "orbax")

    save = str(tmp_path / "orbax_run")
    trainer = _make_trainer(corpus, save)
    assert trainer.ckpt.backend == "orbax"
    error = trainer.fit(epochs=1)
    assert math.isfinite(error)
    assert trainer.ckpt._impl.exists()

    import jax
    trainer2 = _make_trainer(corpus, save)
    trainer2.init_state()
    fresh = np.asarray(jax.tree.leaves(trainer2.state.params)[0]).copy()
    assert trainer2.resume()
    assert trainer2.best_error == trainer.best_error
    restored = np.asarray(jax.tree.leaves(trainer2.state.params)[0])
    assert not np.array_equal(fresh, restored)


def test_exact_precise_bn_idempotent_and_stat_independent(corpus, tmp_path):
    """bn_reestimate_exact SETS the running statistics to the batch-moment
    average: applying it twice is a no-op, and two trainers starting from
    DIFFERENT running stats land on identical stats (a pure function of
    the params). The EWMA mode guarantees neither (momentum 0.9 leaves a
    43% mixture of whatever was there before)."""
    import jax
    import jax.numpy as jnp

    def exact_trainer():
        mcfg = ModelConfig(compute_dtype="float32")
        tcfg = TrainConfig(
            lr=1e-3, epochs=1, train_batch_size=8, eval_batch_size=8,
            mask_min_disp=0.0, bn_reestimate_batches=2,
            bn_reestimate_exact=True,
            save_path=str(tmp_path / "exact"), log_every=1)
        train_pipe = StereoPipeline(corpus, 8, training=False, crop=CROP,
                                    kitti=True, num_workers=2)
        eval_pipe = StereoPipeline(corpus, 8, training=False, crop=CROP,
                                   kitti=True, num_workers=2)
        return Trainer(
            TrainerConfig(model=mcfg, train=tcfg, eval_metric="epe"),
            train_pipe, eval_pipe, logging.getLogger("test_trainer"))

    t1 = exact_trainer()
    t1.init_state()
    t1.reestimate_bn(0)
    stats1 = jax.tree_util.tree_leaves(t1.state.batch_stats)
    t1.reestimate_bn(5)  # different epoch arg must not matter
    stats1b = jax.tree_util.tree_leaves(t1.state.batch_stats)
    for a, b in zip(stats1, stats1b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    t2 = exact_trainer()
    t2.init_state()
    # scramble t2's running stats; exact recalib must erase the difference
    t2.state = t2.state.replace(batch_stats=jax.tree_util.tree_map(
        lambda x: x + jnp.full_like(x, 0.37), t2.state.batch_stats))
    t2.reestimate_bn(0)
    stats2 = jax.tree_util.tree_leaves(t2.state.batch_stats)
    for a, b in zip(stats1, stats2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
