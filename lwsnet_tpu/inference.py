"""Anytime inference engine: per-stage jitted programs + image IO.

The user-facing equivalent of the reference's inference driver
(reference: inference.py:78-138), as a library API. Each `num_stages` value
gets its own compiled program (stage-k inference really does skip stages
k+1.., unlike the reference which always runs all four), and programs are
cached per input shape.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lwsnet_tpu.config import ModelConfig
from lwsnet_tpu.data import png as stdpng
from lwsnet_tpu.data import transforms as T
from lwsnet_tpu.models.lwsnet import LWSNet
from lwsnet_tpu.utils.colormap import colorize_disparity


def make_forward(model: LWSNet, num_stages: Optional[int] = None,
                 use_pallas: Optional[bool] = None,
                 interpret: Optional[bool] = None):
    """Build the jittable inference forward honoring `cfg.use_pallas`.

    With `use_pallas` (default: `model.cfg.use_pallas`) the cascade is
    assembled functionally from the LWSNet parameter subtrees so the hot
    stages run as fused Pallas kernels (inference semantics, BN folded):

      * stage-1 cost filtering + identity skip + soft-argmin runs as ONE
        VMEM-resident kernel (`lwsnet_tpu.ops.pallas.costfilter`);
      * the stage-4 refinement runs as row-canvas per-layer kernels
        (`lwsnet_tpu.models.refine_pallas`, `cfg.pallas_mode`).

    Stages 2-3 (small residual volumes) and all glue stay XLA. The XLA
    module path (`use_pallas=False`) is the training path, the correctness
    oracle (tests/test_pallas_refine.py), and the sane CPU choice — off-TPU
    the kernels fall back to interpreter mode only to stay jittable.

    Returns forward(variables, left, right) -> [disp_1..disp_stages].
    """
    cfg = model.cfg
    stages = num_stages if num_stages is not None else cfg.num_stages
    if use_pallas is None:
        use_pallas = cfg.use_pallas
    if not use_pallas:
        def forward(variables, left, right):
            return model.apply(variables, left, right, train=False,
                               num_stages=stages)
        return forward

    from lwsnet_tpu.models import refine_pallas
    from lwsnet_tpu.models.feature import FeatureExtractor
    from lwsnet_tpu.ops import stereo
    from lwsnet_tpu.ops.pallas import costfilter

    interp = (jax.default_backend() != "tpu") if interpret is None \
        else interpret
    dtype = cfg.dtype

    assert 1 <= stages <= 4, stages  # same contract as LWSNet.__call__

    def forward(variables, left, right):
        # Mirrors LWSNet.__call__ (lwsnet_tpu/models/lwsnet.py) with Pallas
        # substitutions; equivalence is pinned by tests/test_pallas_refine.py.
        p, s = variables["params"], variables["batch_stats"]
        B, H, W, _ = left.shape
        assert H % 8 == 0 and W % 8 == 0, (
            f"input dims must be multiples of 8, got {H}x{W}")
        both = jnp.concatenate([left, right], axis=0).astype(dtype)
        feats = FeatureExtractor(cfg.feature_channels, dtype=dtype).apply(
            {"params": p["FeatureExtractor_0"],
             "batch_stats": s["FeatureExtractor_0"]}, both, False)

        preds = []
        for scale in range(min(stages, 3)):
            with jax.named_scope(f"stage{scale + 1}"):
                fl, fr = feats[scale][:B], feats[scale][B:]
                fh, fw = fl.shape[1], fl.shape[2]
                D = cfg.max_disp_list[scale]
                if scale == 0:
                    cost = stereo.build_cost_volume(fl, fr, D)
                    start = 0
                else:
                    wflow = stereo.resize_bilinear(preds[-1], fh, fw) \
                        * (fh / H)
                    cost = stereo.build_residual_volume(fl, fr, wflow, D)
                    start = -D + 1
                # All three cost stages run as Pallas kernels: stages 2-3
                # (D=9, C=8) the fused folded-D kernel — filter + skip +
                # regression, volume VMEM-resident; stage 1 (D=24, C=32) the
                # disparity-gridded per-layer kernels (the dispatch lives in
                # ops/pallas/costfilter.filter_soft_argmin).
                channels = cfg.channels_3d * cfg.growth_rate[scale]
                subtree = {"params": p[f"CostFilter3D_{scale}"],
                           "batch_stats": s[f"CostFilter3D_{scale}"]}
                d = costfilter.filter_soft_argmin(
                    cost, subtree["params"], subtree["batch_stats"],
                    layers=cfg.layers_3d, channels=channels, start=start,
                    dtype=dtype, interpret=interp)
                d = d * (H / fh)
                d_up = stereo.resize_bilinear(d, H, W)
                preds.append(d_up if scale == 0 else d_up + preds[-1])

        if stages == 4:
            with jax.named_scope("stage4_refinement"):
                res = refine_pallas.refine_residual(
                    variables, left, preds[-1], dtype=dtype,
                    interpret=interp, mode=cfg.pallas_mode,
                    paired=cfg.rows_paired, dw=cfg.rows_dw)
                preds.append(preds[-1] + res)
        return [x.astype(jnp.float32) for x in preds]

    return forward


class InferenceEngine:
    """Wraps a model + params with per-(shape, stages) compiled programs."""

    def __init__(self, cfg: ModelConfig, variables: dict,
                 eval_height: int = 368, eval_width: int = 1232):
        self.cfg = cfg
        self.model = LWSNet(cfg)
        self.variables = variables
        self.eval_height = eval_height
        self.eval_width = eval_width
        self._programs: Dict[Tuple, "jax.stages.Compiled"] = {}

    def _program(self, shape: Tuple[int, ...], num_stages: int):
        key = (shape, num_stages)
        if key not in self._programs:
            self._programs[key] = jax.jit(
                make_forward(self.model, num_stages=num_stages))
        return self._programs[key]

    def preprocess(self, left: np.ndarray, right: np.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Bottom-right crop to the eval window + ImageNet normalize
        (reference: inference.py:93-103)."""
        th, tw = self.eval_height, self.eval_width
        left = T.normalize(T.bottom_right_crop(left, th, tw))
        right = T.normalize(T.bottom_right_crop(right, th, tw))
        return (jnp.asarray(left[None]), jnp.asarray(right[None]))

    def __call__(self, left: jnp.ndarray, right: jnp.ndarray,
                 num_stages: Optional[int] = None) -> List[np.ndarray]:
        """Run the cascade. left/right: (B, H, W, 3) normalized NHWC."""
        stages = num_stages if num_stages is not None else self.cfg.num_stages
        fn = self._program(tuple(left.shape), stages)
        outs = fn(self.variables, left, right)
        return [np.asarray(o[..., 0]) for o in outs]

    def infer_files(self, left_path: str, right_path: str,
                    num_stages: Optional[int] = None
                    ) -> Tuple[List[np.ndarray], float]:
        """Load a pair from disk, run, return (per-stage disparities, sec).
        Timing covers the device forward only, like the reference
        (reference: inference.py:107-111)."""
        left = T.load_image(left_path)
        right = T.load_image(right_path)
        l, r = self.preprocess(left, right)
        stages = num_stages if num_stages is not None else self.cfg.num_stages
        fn = self._program(tuple(l.shape), stages)
        fn(self.variables, l, r)  # warm the program cache
        t0 = time.perf_counter()
        outs = jax.block_until_ready(fn(self.variables, l, r))
        dt = time.perf_counter() - t0
        return [np.asarray(o[0, :, :, 0]) for o in outs], dt


def save_disparity_png(path: str, disp: np.ndarray,
                       colormap: bool = True) -> None:
    """Write a disparity map as a JET-colormapped PNG
    (reference: inference.py:113-122) or raw 16-bit (KITTI submission
    format: uint16 = disp * 256)."""
    if colormap:
        stdpng.write_png(path, colorize_disparity(disp))
    else:
        stdpng.write_png(
            path, (np.clip(disp, 0, 255) * 256.0).astype(np.uint16))
