"""Epoch-level train/eval orchestration.

The host-side loop shared by the SceneFlow-pretrain and KITTI-finetune entry
points (reference: train.py:107-199, finetune.py:122-210): per-epoch train
pass, per-epoch validation, best-only checkpointing with
{epoch, lr, error, time_cost} metadata, resume. All device work happens in
the jitted steps from `lwsnet_tpu.training.steps`; this file only moves
batches, accumulates meters, and logs.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import numpy as np

from lwsnet_tpu.config import MeshConfig, ModelConfig, TrainConfig
from lwsnet_tpu.data.pipeline import StereoPipeline
from lwsnet_tpu.models.lwsnet import LWSNet
from lwsnet_tpu.parallel import mesh as mesh_lib
from lwsnet_tpu.training import steps as steps_lib
from lwsnet_tpu.training.checkpoint import CheckpointManager
from lwsnet_tpu.training.metrics import AverageMeter
from lwsnet_tpu.training.state import TrainState, create_train_state


@dataclass
class TrainerConfig:
    model: ModelConfig
    train: TrainConfig
    eval_metric: str = "d1"  # "d1" (KITTI) or "epe" (SceneFlow)
    sceneflow_row_offset: int = 0  # 4 for SceneFlow eval (reference: train.py:189)


class Trainer:
    def __init__(self, tcfg: TrainerConfig, train_pipe: StereoPipeline,
                 eval_pipe: StereoPipeline, logger,
                 mesh_cfg: MeshConfig = MeshConfig(),
                 stat_pipe: Optional[StereoPipeline] = None):
        self.tcfg = tcfg
        self.train_pipe = train_pipe
        self.eval_pipe = eval_pipe
        # Precise-BN statistics pipeline; defaults to train_pipe. Batch-mode
        # statistics estimation is a CASCADE (each layer's batch stats
        # normalize what the next layer sees), so the resulting running
        # stats depend on the stat batch SIZE — restoring a checkpoint into
        # a trainer whose precise-BN runs at a different batch size yields
        # a measurably different function (r5: a 3.48 px state read 15+ px
        # after batch-4 recalibration of batch-8-calibrated stats). Pass an
        # explicit stat_pipe to keep the protocol fixed when the train
        # batch changes between phases.
        self.stat_pipe = stat_pipe or train_pipe
        self.log = logger
        self.model = LWSNet(tcfg.model)
        self.mesh = mesh_lib.make_mesh(mesh_cfg)
        self.mesh_cfg = mesh_cfg

        # Optimizer steps per epoch = this host's batch count: every host
        # steps once per *local* batch (the all-reduce is inside the step),
        # so the epoch->step milestone conversion must NOT scale by
        # process_count (reference decays per-epoch, finetune.py:178).
        spe = max(1, train_pipe.batches_per_epoch())
        self.steps_per_epoch = spe
        self.train_step = steps_lib.make_train_step(
            self.model, tcfg.train, spe)
        self.eval_step = steps_lib.make_eval_step(
            self.model, max_disp=tcfg.model.max_disp,
            sceneflow_row_offset=tcfg.sceneflow_row_offset)
        self.stat_step = steps_lib.make_stat_step(self.model)
        self.ckpt = CheckpointManager(tcfg.train.save_path)

        self.state: Optional[TrainState] = None
        self.best_error = math.inf
        self.start_epoch = 0
        self.start_time = time.time()
        self.last_lr = tcfg.train.lr  # live schedule value, from step aux

    # -- state management ---------------------------------------------------

    def init_state(self, seed: int = 0):
        h, w = self.train_pipe.crop
        self.state = create_train_state(
            self.model, self.tcfg.train, jax.random.PRNGKey(seed), (h, w),
            self.steps_per_epoch)
        self.state = mesh_lib.replicate_state(self.mesh, self.state)
        return self.state

    def resume(self) -> bool:
        """Restore best checkpoint + metadata (reference: train.py:82-105)."""
        assert self.state is not None, "call init_state() first"
        restored, meta = self.ckpt.restore(self.state)
        if restored is None:
            return False
        self.state = mesh_lib.replicate_state(self.mesh, restored)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_error = float(meta.get("error", math.inf))
        self.start_time = time.time() - float(meta.get("time_cost", 0.0))
        self.log.info(
            "resumed: epoch=%d error=%.4f time_cost=%.2fh",
            self.start_epoch, self.best_error,
            float(meta.get("time_cost", 0.0)) / 3600)
        return True

    def load_pretrained(self, path: str) -> bool:
        """Bootstrap params from a pretrain checkpoint
        (reference: finetune.py:87-91)."""
        assert self.state is not None
        loaded = CheckpointManager(path).restore_params_only(self.state)
        if loaded is None:
            return False
        self.state = mesh_lib.replicate_state(self.mesh, loaded)
        self.log.info("loaded pretrained params from %s", path)
        return True

    # -- epochs -------------------------------------------------------------

    def train_epoch(self, epoch: int) -> None:
        cfg = self.tcfg.train
        n_stages = self.tcfg.model.num_stages
        meters = [AverageMeter() for _ in range(n_stages)]
        n_batches = self.train_pipe.batches_per_epoch()

        for i, batch in enumerate(self.train_pipe.epoch(epoch)):
            sharded = mesh_lib.shard_batch(
                self.mesh,
                {"l": batch.left, "r": batch.right, "g": batch.disparity},
                self.mesh_cfg)
            self.state, aux = self.train_step(
                self.state, sharded["l"], sharded["r"], sharded["g"])
            # Meters average EVERY batch (reference: train.py:149-152);
            # logging stays on the log_every cadence.
            stage_losses = np.asarray(aux["stage_losses"])
            for m, v in zip(meters, stage_losses):
                m.update(float(v))
            self.last_lr = float(aux["lr"])
            if i % cfg.log_every == 0:
                msg = "\t".join(
                    f"Stage {s} = {m.val:.2f}({m.avg:.2f})"
                    for s, m in enumerate(meters))
                self.log.info("Train Epoch%d [%d/%d]\t%s",
                              epoch, i, n_batches, msg)

        self.log.info(
            "Average train loss = %s",
            "\t".join(f"Stage {s} = {m.avg:.2f}" for s, m in enumerate(meters)))

    def reestimate_bn(self, epoch: int) -> None:
        """Precise-BN pass (cfg.bn_reestimate_batches > 0): refresh the BN
        running statistics with forward-only passes over training batches so
        validation sees statistics that match the current params.

        With cfg.bn_reestimate_exact the pass SETS the statistics to the
        moment average over the batches (variance aggregated with the
        between-batch mean correction) instead of EWMA-chasing them. The
        flax update is ra' = m*ra + (1-m)*bs, so one step from unchanged
        stats recovers each batch's true bs = (ra' - m*ra)/(1-m) exactly;
        the result is a deterministic function of the params — measured r5:
        the EWMA pass (momentum 0.9, 8 steps leaves 43% of the old mixture)
        moved a checkpoint's eval from 4.7 to 7.6 px with params untouched,
        because this architecture's eval is hyper-sensitive to the stat
        mixture. Exact mode makes recalibration idempotent, so best-
        checkpoint selection and cross-phase restores compare one function
        per params."""
        n = self.tcfg.train.bn_reestimate_batches
        if not n:
            return
        if not self.tcfg.train.bn_reestimate_exact:
            done = 0
            while done < n:  # reshuffled epochs until n batches consumed
                for batch in self.stat_pipe.epoch(1_000_000 + epoch + done):
                    sharded = mesh_lib.shard_batch(
                        self.mesh, {"l": batch.left, "r": batch.right},
                        self.mesh_cfg)
                    self.state = self.stat_step(
                        self.state, sharded["l"], sharded["r"])
                    done += 1
                    if done >= n:
                        break
            return

        m = 0.9  # nn.BatchNorm momentum (lwsnet_tpu/models/blocks.py)
        s0 = self.state.batch_stats
        flat0, treedef = jax.tree_util.tree_flatten_with_path(s0)
        sums = [None] * len(flat0)  # per-leaf running sums of batch stats
        done = 0
        while done < n:
            for batch in self.stat_pipe.epoch(1_000_000 + epoch + done):
                sharded = mesh_lib.shard_batch(
                    self.mesh, {"l": batch.left, "r": batch.right},
                    self.mesh_cfg)
                # stat_step from the UNCHANGED s0 each time; recover bs.
                st = self.stat_step(self.state, sharded["l"], sharded["r"])
                flat1 = jax.tree_util.tree_leaves(st.batch_stats)
                for i, ((_, a0), a1) in enumerate(zip(flat0, flat1)):
                    bs = (a1 - m * a0) / (1.0 - m)
                    acc = sums[i]
                    sums[i] = [bs, bs * bs] if acc is None else \
                        [acc[0] + bs, acc[1] + bs * bs]
                done += 1
                if done >= n:
                    break
        paths = [p for p, _ in flat0]
        new_leaves = []
        for (path, _), acc in zip(flat0, sums):
            if path[-1].key == "var":
                # corpus var = E_j[var_j] + Var_j(mean_j) (between-batch
                # mean spread, from the sibling "mean" leaf's moments)
                mean_path = path[:-1] + (jax.tree_util.DictKey("mean"),)
                idx = paths.index(mean_path)
                m1, m2 = sums[idx][0] / done, sums[idx][1] / done
                new_leaves.append(acc[0] / done + (m2 - m1 * m1))
            else:
                new_leaves.append(acc[0] / done)
        self.state = self.state.replace(
            batch_stats=jax.tree_util.tree_unflatten(treedef, new_leaves))

    def evaluate(self) -> float:
        """Run validation; returns the stage-(last) headline metric."""
        n_stages = self.tcfg.model.num_stages
        sums = np.zeros((2, n_stages))
        weight = 0.0
        for batch in self.eval_pipe.epoch(0):
            sharded = mesh_lib.shard_batch(
                self.mesh,
                {"l": batch.left, "r": batch.right, "g": batch.disparity,
                 "v": batch.valid},
                self.mesh_cfg)
            out = self.eval_step(self.state, sharded["l"], sharded["r"],
                                 sharded["g"], sharded["v"])
            sums[0] += np.asarray(out["epe"])
            sums[1] += np.asarray(out["d1"])
            weight += float(out["weight"])
        weight = max(weight, 1.0)
        epes, d1s = sums[0] / weight, sums[1] / weight
        self.log.info("Average test EPE = %s",
                      ", ".join(f"Stage {s}={v:.2f}" for s, v in enumerate(epes)))
        self.log.info("Average test 3-Pixel Error = %s",
                      ", ".join(f"Stage {s}={v:.4f}" for s, v in enumerate(d1s)))
        return float(d1s[-1] if self.tcfg.eval_metric == "d1" else epes[-1])

    def fit(self, epochs: Optional[int] = None) -> float:
        if self.state is None:
            self.init_state(self.tcfg.train.seed)
        epochs = epochs if epochs is not None else self.tcfg.train.epochs
        error = self.best_error
        for epoch in range(self.start_epoch, epochs):
            self.train_epoch(epoch)
            self.reestimate_bn(epoch)
            error = self.evaluate()
            # `error` is identical on every process (the eval sums are
            # all-reduced inside the jitted step), so this branch is taken
            # in lockstep across hosts. EVERY process must call ckpt.save:
            # the orbax backend is a collective (each host writes its
            # addressable shards); the msgpack backend gates on process 0
            # internally. Gating here would deadlock multi-host orbax saves.
            if error < self.best_error:
                self.best_error = error
                self.ckpt.save(
                    self.state,
                    {"epoch": epoch, "lr": self.last_lr,
                     "error": error,
                     "time_cost": time.time() - self.start_time})
                self.log.info("save model param success")
        self.log.info("full training time = %.2f Hours",
                      (time.time() - self.start_time) / 3600)
        return error
