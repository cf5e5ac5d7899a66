"""LWSNet: the 4-stage anytime stereo cascade, NHWC / JAX.

TPU-first re-design of the reference top-level model
(reference: models/models.py:7-179):

  stage 1: full L1 cost volume over 24 disparities at 1/8 res -> 3D-CNN
           (+identity skip) -> soft-argmin -> upsample            (absolute)
  stage 2: warped residual volume (9 offsets) at 1/4 res -> ...   (residual)
  stage 3: same at 1/2 res                                        (residual)
  stage 4: color-guidance refinement towers at full res           (residual)

Departures from the reference, motivated by XLA/TPU:

* Left and right images run through the shared-weight feature extractor as a
  single 2B-batch call instead of two B-batch calls
  (reference: models/models.py:110-111 runs the net twice).
* Cost volumes are functional, vectorized builds (`lwsnet_tpu.ops.stereo`),
  not in-place strided writes; the residual volume never materializes the
  B*(2D-1) feature copies of the reference (models/models.py:86-99).
* `num_stages` is a static (trace-time) argument: requesting k stages compiles
  a program containing *only* stages 1..k — the anytime early-exit costs
  nothing at runtime and there is no dynamic control flow inside jit.
* All resolution bookkeeping (the img_H/feat_H disparity rescaling of
  reference models/models.py:119-121, 145, 153) happens on static shapes.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
from flax import linen as nn

from lwsnet_tpu.config import ModelConfig
from lwsnet_tpu.models.blocks import CostFilter3D
from lwsnet_tpu.models.feature import FeatureExtractor
from lwsnet_tpu.models.refinement import RefinementHead, RefinementTower
from lwsnet_tpu.ops import stereo


class LWSNet(nn.Module):
    """Anytime stereo disparity network. Input: left/right (B, H, W, 3) NHWC,
    ImageNet-normalized. Output: list of (B, H, W, 1) float32 disparities at
    full resolution, one per requested stage."""

    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray,
                 train: bool = False,
                 num_stages: Optional[int] = None) -> List[jnp.ndarray]:
        cfg = self.cfg
        stages = num_stages if num_stages is not None else cfg.num_stages
        assert 1 <= stages <= 4, stages
        B, H, W, _ = left.shape
        assert H % 8 == 0 and W % 8 == 0, (
            f"input dims must be multiples of 8, got {H}x{W}")
        dtype = cfg.dtype

        # Shared-weight feature extraction on a stacked 2B batch
        # (reference: models/models.py:110-111).
        both = jnp.concatenate([left, right], axis=0).astype(dtype)
        feats = FeatureExtractor(cfg.feature_channels, dtype=dtype)(both, train)
        feats_l = [f[:B] for f in feats]
        feats_r = [f[B:] for f in feats]

        preds: List[jnp.ndarray] = []
        for scale in range(min(stages, 3)):
            fl, fr = feats_l[scale], feats_r[scale]
            fh, fw = fl.shape[1], fl.shape[2]
            D = cfg.max_disp_list[scale]
            if scale == 0:
                # (reference: models/models.py:129-134)
                cost = stereo.build_cost_volume(fl, fr, D)
            else:
                # Downscale previous full-res disparity to feature res and to
                # feature-scale pixel units (reference: models/models.py:117-127).
                # Disparity values stay float32: bf16 has too little mantissa
                # for sub-pixel warp offsets at disparities up to 192.
                wflow = stereo.resize_bilinear(preds[-1], fh, fw) * (fh / H)
                cost = stereo.build_residual_volume(fl, fr, wflow, D)

            # 3D-CNN cost filtering with identity skip
            # (reference: models/models.py:136-138), directly on the
            # (B, H, W, D) volume layout.
            filt = CostFilter3D(
                cfg.layers_3d, cfg.channels_3d * cfg.growth_rate[scale],
                impl=cfg.conv3d_impl, dtype=dtype,
            )(cost, train)
            cost = filt + cost

            # Soft-argmin regression, rescale to full-res disparity units,
            # bilinear upsample (reference: models/models.py:140-156).
            if scale == 0:
                d = stereo.soft_argmin(cost, 0, D)
            else:
                d = stereo.soft_argmin(cost, -D + 1, D)
            d = d * (H / fh)
            d_up = stereo.resize_bilinear(d, H, W)
            preds.append(d_up if scale == 0 else d_up + preds[-1])

        if stages == 4:
            # Stage 4: color-guidance refinement (reference: models/models.py:158-162).
            tower_l = RefinementTower(cfg.refine_channels, dtype=dtype)(
                left.astype(dtype), train)
            tower_d = RefinementTower(cfg.refine_channels, dtype=dtype)(
                preds[-1].astype(dtype), train)
            residual = RefinementHead(cfg.refine_channels, dtype=dtype)(
                jnp.concatenate([tower_l, tower_d], axis=-1), train)
            preds.append(preds[-1] + residual.astype(jnp.float32))

        return [p.astype(jnp.float32) for p in preds]
