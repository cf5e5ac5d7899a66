"""Typed configuration for the whole framework.

The reference spreads its configuration over three argparse blocks
(reference: train.py:19-39, finetune.py:18-41, inference.py:17-29), duplicating
every flag. Here a single set of frozen dataclasses is shared by every entry
point; canonical defaults mirror the reference's published recipe
(maxdisp=192, maxdisplist=[24,5,5], channels_3d=8, layers_3d=4,
growth_rate=[4,1,1], loss_weights=[.25,.5,1,1]).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference: train.py:21-29)."""

    max_disp: int = 192
    # Per-stage disparity search ranges: stage 1 searches [0, 24) at 1/8 res,
    # stages 2-3 search residual offsets in [-4, 4] (D=5 -> 2D-1=9 hypotheses)
    # at 1/4 and 1/2 res (reference: models/models.py:90-93, 142, 151-152).
    max_disp_list: Tuple[int, ...] = (24, 5, 5)
    channels_3d: int = 8
    layers_3d: int = 4
    growth_rate: Tuple[int, ...] = (4, 1, 1)
    refine_channels: int = 32
    feature_channels: int = 8  # base channel count of the 2D feature extractor
    # Compute dtype for convolutions / cost volumes. Params and batch-norm
    # statistics always stay float32; bfloat16 compute feeds the MXU at twice
    # the f32 rate on TPU.
    compute_dtype: str = "bfloat16"
    # Use the fused Pallas refinement kernels for stage-4 inference when
    # True; the XLA module path is the training path, the correctness oracle,
    # and the sane CPU fallback.
    use_pallas: bool = True
    # Pallas refinement granularity: "rows" = row-canvas per-layer kernels
    # (channels on matmul rows, 2-D vector values only) — the default:
    # ~13 s cold Mosaic compile AND the fastest measured mode (4.9 ms vs
    # 8.1 ms "layers" at 368x1232 on v5e). "layers" = planar per-layer
    # kernels (~270 s cold compile; every op unrolls over C).
    pallas_mode: str = "rows"
    # "rows" mode layer fusion: True runs consecutive dw-sep layers pairwise
    # in one kernel (intermediate canvas never leaves VMEM, halving HBM
    # round trips at the cost of recomputing layer-1 taps over the halo
    # rows); False keeps one kernel per layer. Measured A/B lives in
    # STAGE4_ANALYSIS.md. The env var LWSNET_ROWS_PAIRED=0/1 overrides this
    # at TRACE time (for A/B scripts only — a jit-cached forward ignores
    # later env changes; set the config field in library code).
    rows_paired: bool = True
    # "rows" mode depthwise engine: "mxu" (default) folds dw+pw into one
    # rank-1-factored dense 3x3 kernel (k[dy,dx,ci,co] =
    # dw[dy,dx,ci]*pw[co,ci] — exact) and runs every layer as an MXU
    # matmul via dense_layer; "vpu" runs the 9 depthwise taps as vector
    # multiply-adds (paired per rows_paired); "chain" fuses whole
    # tower/head stacks into single kernels. Measured r5 A/B at 368x1232
    # (STAGE4_AB.json / STAGE4_ANALYSIS.md): mxu 3.10 ms, vpu unpaired
    # 4.15, vpu paired 4.53, chain 7.21 (halo recompute dominates). Env
    # override LWSNET_ROWS_DW (trace-time, A/B scripts only).
    rows_dw: str = "mxu"
    # 3D cost-filter conv formulation: "auto" picks per stage ("folded" block-
    # banded 2D conv when D*C fits the 128-lane axis, else "kdbatch" 2D conv
    # with D folded into batch); "xla3d" is the naive 3-spatial-dim conv kept
    # as the correctness oracle. All three compute identical math.
    conv3d_impl: str = "auto"
    # Number of cascade stages to run (1..4); 4 = full anytime pipeline.
    num_stages: int = 4

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline settings (reference: dataloader/dataloader.py:61-92)."""

    datapath: str = ""
    val_split_file: str = ""  # KITTI val split; empty -> builtin 40-frame split
    crop_height: int = 256
    crop_width: int = 512
    eval_height: int = 368  # KITTI eval crop (reference: dataloader/dataloader.py:81)
    eval_width: int = 1232
    sceneflow_eval_height: int = 544  # reference: dataloader/dataloader.py:85
    sceneflow_eval_width: int = 960
    num_workers: int = 8
    prefetch_depth: int = 2
    shuffle_seed: int = 0
    # Reproduce the reference's SceneFlow driving corpus quirk which indexes
    # the 15mm focal-length split twice and never the 35mm one
    # (reference: dataloader/sceneflow.py:105). False = fixed corpus.
    sceneflow_compat_duplicate_15mm: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (reference: train.py:30-34, finetune.py:29-33)."""

    lr: float = 5e-4
    epochs: int = 10
    train_batch_size: int = 8
    eval_batch_size: int = 8
    loss_weights: Tuple[float, ...] = (0.25, 0.5, 1.0, 1.0)
    # MultiStep decay used only by the KITTI finetune recipe
    # (reference: finetune.py:82-84). Milestone 400 > 300 epochs, so only the
    # epoch-200 decay ever fires; kept as published.
    lr_milestones: Tuple[int, ...] = ()
    lr_gamma: float = 0.1
    # Linear lr warmup over this many steps (0 = off, the reference's
    # behavior). Essential when a FRESH optimizer resumes already-trained
    # params: Adam's bias-corrected first updates are ~lr*sign(g) per
    # param, a coordinated perturbation that measurably destroys a
    # converged state (see make_lr_schedule).
    warmup_steps: int = 0
    # Precise-BN mode for Trainer.reestimate_bn. False = EWMA stat steps
    # (reference-flavored; the result depends on the prior stats and batch
    # order). True = SET the stats to the exact moment average over the
    # batches — a deterministic, idempotent function of the params; see
    # the reestimate_bn docstring for the measured failure this fixes.
    bn_reestimate_exact: bool = False
    # Loss mask: pretrain masks gt < max_disp, finetune masks gt > 0
    # (reference: train.py:137 vs finetune.py:153).
    mask_min_disp: float = -jnp.inf
    mask_max_disp: float = jnp.inf
    # Gradient clipping by global norm; 0 disables. The reference trains
    # un-clipped in fp32 (reference: train.py:80); under bf16 compute the
    # soft-argmin can saturate and spike the gradient, which un-clipped Adam
    # turns into a permanently inflated second moment (observed: round-2
    # OVERFIT_PROOF divergence). Clipping bounds the spike; it does not
    # change converged behavior on well-conditioned steps.
    grad_clip_norm: float = 5.0
    # Skip (don't apply) parameter/optimizer/batch-stat updates from a step
    # whose loss or gradients are non-finite. One NaN batch otherwise poisons
    # the BN running statistics forever (eval-path NaN while training keeps
    # "working" off batch stats — the round-2 failure signature).
    skip_nonfinite_updates: bool = True
    # BatchNorm behavior inside the train step:
    #   "batch"  — normalize by the current batch's statistics and update
    #              the running stats (reference semantics, the default).
    #   "frozen" — normalize by the (fixed) running statistics; stats don't
    #              update. Standard for finetuning, and REQUIRED for
    #              small-fixed-set overfit runs: with a repeated tiny batch,
    #              batch-mode BN lets the network co-adapt to its own batch
    #              statistics, producing razor-thin chaotic minima where the
    #              in-step loss reads ~2 px while any reevaluation of the
    #              same params lands at ~20 px (diagnosed r4 by bisecting
    #              across independently-compiled programs: different XLA
    #              fusions of the identical forward disagree 10x at such
    #              states, and one lr=1e-4 Adam step moves loss 1.9 -> 24).
    bn_mode: str = "batch"
    # "Precise BN": before each validation pass, refresh the BN running
    # statistics with this many forward-only passes over training batches
    # (no parameter updates). 0 = reference semantics (evaluate on the EMA
    # as-is). Useful when the EMA lags the params — on small corpora the
    # cascade amplifies the stats mismatch into multi-pixel eval error
    # while the train-mode loss is already sub-pixel.
    bn_reestimate_batches: int = 0
    save_path: str = "results/run"
    resume: str = ""
    pretrained: str = ""
    log_every: int = 5
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding.

    The reference is strictly single-GPU (reference: train.py:52); the data
    axis here is new design. `data` shards the batch; `spatial` optionally
    shards image rows for very large inputs (halo exchange handled by XLA's
    conv padding).
    """

    data_axis: str = "data"
    spatial_axis: str = "spatial"
    data_parallel: int = -1  # -1 => all devices
    spatial_parallel: int = 1


def pretrain_config(datapath: str = "dataset/sceneflow/") -> tuple:
    """The published SceneFlow recipe (reference: train.py:19-39)."""
    model = ModelConfig()
    data = DataConfig(datapath=datapath)
    train = TrainConfig(
        lr=5e-4, epochs=10, train_batch_size=8, eval_batch_size=8,
        mask_max_disp=192.0, save_path="results/pretrained",
    )
    return model, data, train


def finetune_config(datapath: str = "dataset/kitti2015/training/") -> tuple:
    """The published KITTI2015 recipe (reference: finetune.py:18-41)."""
    model = ModelConfig()
    data = DataConfig(datapath=datapath)
    train = TrainConfig(
        lr=5e-4, epochs=300, train_batch_size=4, eval_batch_size=8,
        lr_milestones=(200, 400), lr_gamma=0.1,
        mask_min_disp=0.0, save_path="results/finetune",
    )
    return model, data, train
