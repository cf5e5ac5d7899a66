"""Staged masked smooth-L1 loss (reference: train.py:127-166, finetune.py:142-181).

The reference uses `masked_select` + per-stage smooth_l1 with weights
[0.25, 0.5, 1.0, 1.0] summed (reference: train.py:145-152). Dynamic-shape
masked_select is hostile to XLA; the jit-friendly formulation multiplies by
the mask and normalizes by the valid count — identical arithmetic.

Mask semantics differ by recipe (reference: train.py:137 vs finetune.py:153):
  pretrain:  gt < max_disp
  finetune:  gt > 0
Both are expressed via (mask_min_disp, mask_max_disp) bounds.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def smooth_l1(x: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """Huber / smooth-L1: 0.5 x^2 for |x|<delta else |x|-0.5*delta, matching
    paddle F.smooth_l1_loss with default delta=1.0 (reference: train.py:147)."""
    ax = jnp.abs(x)
    return jnp.where(ax < delta, 0.5 * ax * ax / delta, ax - 0.5 * delta)


def disparity_mask(gt: jnp.ndarray, min_disp: float, max_disp: float
                   ) -> jnp.ndarray:
    """Valid-pixel mask, float32. min/max are exclusive bounds."""
    return ((gt > min_disp) & (gt < max_disp)).astype(jnp.float32)


def staged_loss(outputs: Sequence[jnp.ndarray], gt: jnp.ndarray,
                loss_weights: Sequence[float],
                min_disp: float = -jnp.inf,
                max_disp: float = jnp.inf,
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted sum of per-stage masked smooth-L1 losses.

    Args:
      outputs: per-stage (B, H, W, 1) or (B, H, W) predicted disparities.
      gt: (B, H, W) ground-truth disparity.
      loss_weights: per-stage weights (reference: train.py:24).
    Returns:
      (total_loss, per_stage_unweighted) — the reference logs the de-weighted
      per-stage values (reference: train.py:150).
    """
    mask = disparity_mask(gt, min_disp, max_disp)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    per_stage = []
    for out in outputs:
        if out.ndim == 4:
            out = out[..., 0]
        err = smooth_l1(out - gt)
        per_stage.append(jnp.sum(err * mask) / count)
    per_stage = jnp.stack(per_stage)
    weights = jnp.asarray(loss_weights[: len(per_stage)], dtype=jnp.float32)
    total = jnp.sum(per_stage * weights)
    return total, per_stage
