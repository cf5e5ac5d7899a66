"""Evaluation metrics: EPE and 3-pixel error (D1).

Definitions follow the reference exactly:
* EPE: mean |pred - gt| over pixels with gt < max_disp
  (reference: train.py:180-190); SceneFlow eval crops the top 4 prediction
  rows so the 544-row network output aligns with 540-row GT
  (reference: train.py:189 `output[:, 4:, :]`).
* D1 (3-pixel error): fraction of pixels with 0 < gt < max_disp where
  |err| > 3 px AND |err|/gt > 5% (reference: finetune.py:212-219).
  The reference's two copies disagree on a +1e-9 denominator epsilon
  (train.py:210 has it, finetune.py:219 doesn't); we always add it — it only
  matters for an empty mask, where the reference would divide by zero.

All metric fns are jit-friendly (mask-and-normalize, no boolean indexing).
"""

from __future__ import annotations

import jax.numpy as jnp


def epe(pred: jnp.ndarray, gt: jnp.ndarray,
        max_disp: float = 192.0) -> jnp.ndarray:
    """End-point error over valid pixels. pred/gt: (B, H, W)."""
    if pred.ndim == 4:
        pred = pred[..., 0]
    mask = (gt < max_disp).astype(jnp.float32)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.abs(pred - gt) * mask) / count


def d1_error(pred: jnp.ndarray, gt: jnp.ndarray,
             max_disp: float = 192.0) -> jnp.ndarray:
    """3-pixel error rate (reference: finetune.py:212-219). pred/gt: (B, H, W)."""
    if pred.ndim == 4:
        pred = pred[..., 0]
    mask = ((gt > 0) & (gt < max_disp)).astype(jnp.float32)
    err = jnp.abs(pred - gt)
    bad = ((err > 3.0) & (err / jnp.maximum(gt, 1e-9) > 0.05)).astype(jnp.float32)
    return jnp.sum(bad * mask) / (jnp.sum(mask) + 1e-9)


class AverageMeter:
    """Running val/avg/sum/count accumulator (reference: utils/utils.py:1-17)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count
