"""Core stereo ops: horizontal warp, cost volumes, soft-argmin, resize.

Pure-jnp, NHWC formulations of the reference's hot loops — these are the
correctness oracles for the Pallas kernels in `lwsnet_tpu.ops.pallas`.

Key TPU-first departures from the reference:

* The reference's `warp` builds a full 2-D normalized mesh grid and calls
  CUDA `grid_sample` (reference: models/models.py:28-55). Disparity warps are
  horizontal-only, so we implement a 1-D bilinear gather along W — half the
  index math and no normalize/denormalize round trip. grid_sample's
  align_corners=True + zero-padding semantics are preserved exactly.
* The reference assembles the full cost volume with 24 in-place strided-slice
  writes (reference: models/models.py:58-76). Functionally, zero-padding the
  right features makes the occlusion fill (`sum |feat_l|` on the occluded
  strip, reference: models/models.py:71) fall out of the same L1 expression,
  so the volume is one vectorized stack XLA can fuse.
* The reference's residual volume materializes B*(2D-1) batch-expanded copies
  of the feature maps and runs grid_sample on each (reference:
  models/models.py:86-99). Here the 2D-1 hypothesis warps become ONE dense
  (W, Wp) x (Wp, K*C) matmul per row against a K-stacked shifted copy of the
  padded right features — the K*C axis fills MXU lanes that C=8/16 leaves
  idle. The trade: a (B, H, Wp, K, C) stacked operand (~K x the feature map,
  like the reference's expansion) in exchange for gather-free MXU execution;
  see `build_residual_volume` for the numbers.

Volumes are laid out (B, H, W, D): D on the minor (lane) axis makes the
softmax/soft-argmin a lane-local reduction, and the 3D-conv treats D as a
spatial dim with channels minor.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def horizontal_warp(feat: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Sample `feat` at x' = x - disp with 1-D bilinear weights, zeros OOB.

    Matches paddle `F.grid_sample(..., mode='bilinear', padding_mode='zeros',
    align_corners=True)` for a grid whose y rows are the identity
    (reference: models/models.py:28-55): with align_corners=True the
    normalize/denormalize in the reference is exactly the identity map, so the
    sample position is x - disp in pixel units.

    Args:
      feat: (B, H, W, C) right-image features.
      disp: (B, H, W) or (B, H, W, 1) disparity in pixels at feature scale.

    Returns:
      (B, H, W, C) warped features.
    """
    if disp.ndim == 4:
        disp = disp[..., 0]
    B, H, W, C = feat.shape
    x = jnp.arange(W, dtype=disp.dtype)[None, None, :]  # (1,1,W)
    xs = x - disp  # (B,H,W) sample positions
    x0 = jnp.floor(xs)
    w1 = (xs - x0).astype(feat.dtype)  # weight for x0+1
    w0 = (1.0 - w1).astype(feat.dtype)
    x0i = x0.astype(jnp.int32)
    x1i = x0i + 1

    def gather(idx, w):
        valid = (idx >= 0) & (idx < W)
        safe = jnp.clip(idx, 0, W - 1)
        g = jnp.take_along_axis(feat, safe[..., None].repeat(C, -1), axis=2)
        return g * (w * valid.astype(feat.dtype))[..., None]

    return gather(x0i, w0) + gather(x1i, w1)


def build_cost_volume(feat_l: jnp.ndarray, feat_r: jnp.ndarray,
                      max_disp: int) -> jnp.ndarray:
    """Full L1 cost volume over integer disparities [0, max_disp).

    cost[b, h, w, d] = sum_c |feat_l[b,h,w,c] - feat_r[b,h,w-d,c]|, with
    feat_r treated as zero for w-d < 0 — which equals the reference's explicit
    occlusion fill sum_c |feat_l| (reference: models/models.py:58-76).

    Args:
      feat_l, feat_r: (B, H, W, C).
    Returns:
      (B, H, W, max_disp) float cost volume.
    """
    B, H, W, C = feat_l.shape
    # Zero-pad right features on the left of the W axis by max_disp-1, then
    # every shifted slice is a static slice of the padded array.
    pad = jnp.pad(feat_r, ((0, 0), (0, 0), (max_disp - 1, 0), (0, 0)))
    slices = [
        jnp.sum(jnp.abs(feat_l - jax.lax.slice_in_dim(
            pad, max_disp - 1 - d, max_disp - 1 - d + W, axis=2)), axis=-1)
        for d in range(max_disp)
    ]
    return jnp.stack(slices, axis=-1)


def build_residual_volume(feat_l: jnp.ndarray, feat_r: jnp.ndarray,
                          disp: jnp.ndarray, max_disp: int,
                          stride: int = 1) -> jnp.ndarray:
    """Residual cost volume over offsets [-max_disp+1, max_disp-1].

    cost[..., k] = sum_c |feat_l - warp(feat_r, disp - offset_k)| with
    offset_k = (k - max_disp + 1) * stride (reference: models/models.py:78-104).

    TPU formulation ("gather = one-hot matmul"): per-pixel gathers are
    pathological on TPU (the gather-based version of this routine measured
    ~300 ms/frame, ~90% of the whole forward). Instead we build ONE bilinear
    interpolation matrix A from the base position x - disp — two nonzeros per
    row, constructed with an iota comparison on the VPU — over a zero-padded
    W axis, and realize each hypothesis warp as A contracted with a
    *statically shifted* copy of the padded right features:

        warp(feat_r, disp - o)[x] = sum_w A[x, w] * feat_r_pad[w + o]

    which puts all the irregular-access work on the MXU as 2D-1 dense
    matmuls. Zero padding reproduces grid_sample's zeros/align_corners=True
    OOB semantics exactly (pad width max_disp covers every offset).

    Gradients w.r.t. `disp` flow through A's fractional weights, matching
    grid_sample's grid gradient.

    Args:
      feat_l, feat_r: (B, H, W, C) features at this scale.
      disp: (B, H, W) or (B, H, W, 1) disparity at feature scale (pixels).
    Returns:
      (B, H, W, 2*max_disp-1) cost volume.
    """
    if disp.ndim == 4:
        disp = disp[..., 0]
    B, H, W, C = feat_r.shape
    P = max_disp * stride  # pad covers the largest |offset| + bilinear tap
    Wp = W + 2 * P
    dtype = feat_r.dtype

    # Interpolation matrix for the base position x - disp, in padded coords.
    x = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    base = x - disp.astype(jnp.float32) + P  # (B, H, W)
    i0 = jnp.floor(base)
    frac = (base - i0).astype(dtype)
    w_iota = jnp.arange(Wp, dtype=jnp.float32)  # (Wp,)
    hit0 = (w_iota[None, None, None, :] == i0[..., None])
    hit1 = (w_iota[None, None, None, :] == (i0[..., None] + 1.0))
    A = (hit0.astype(dtype) * (1.0 - frac)[..., None]
         + hit1.astype(dtype) * frac[..., None])  # (B, H, W, Wp)

    pad = jnp.pad(feat_r, ((0, 0), (0, 0), (P, P), (0, 0)))
    offsets = [(k - max_disp + 1) * stride for k in range(2 * max_disp - 1)]
    K = len(offsets)
    # shifted[w] == pad[w + o]; the wrapped-around entries of roll always
    # land in a zero-pad region (|o| <= P), so they contribute nothing.
    # All K hypotheses stack on the contraction's output axis so the warp is
    # ONE (W, Wp) x (Wp, K*C) matmul per row instead of K thin N=C matmuls —
    # K*C (72 at stages 2-3) fills the MXU lane axis that C=8/16 leaves idle.
    shifted = jnp.stack([jnp.roll(pad, -o, axis=2) for o in offsets], axis=3)
    warped = jnp.einsum("bhxw,bhwm->bhxm",
                        A, shifted.reshape(B, H, Wp, K * C))
    warped = warped.reshape(B, H, W, K, C)
    return jnp.sum(jnp.abs(feat_l[:, :, :, None, :] - warped), axis=-1)


def soft_argmin(cost: jnp.ndarray, start: int, end: int,
                stride: int = 1) -> jnp.ndarray:
    """Expectation of disparity under softmax(-cost) over the last axis.

    Bins are arange(start*stride, end*stride, stride)
    (reference: models/models.py:167-179); the reference applies
    softmax(-cost) (reference: models/models.py:142).

    Args:
      cost: (B, H, W, D) with D == end - start.
    Returns:
      (B, H, W, 1) expected disparity, float32.
    """
    bins = jnp.arange(start * stride, end * stride, stride, dtype=jnp.float32)
    probs = jax.nn.softmax(-cost.astype(jnp.float32), axis=-1)
    return jnp.sum(probs * bins, axis=-1, keepdims=True)


@functools.lru_cache(maxsize=64)
def _linear_resize_matrix(n_in: int, n_out: int):
    """Dense (n_out, n_in) 1-D bilinear interpolation matrix with half-pixel
    centers and edge clamping — exactly `interpolate(mode='bilinear',
    align_corners=False)` along one axis. Built once per (in, out) pair.

    Returns a *numpy* array: caching a jnp array here would capture a traced
    constant when first called inside jit and leak the tracer across traces.
    """
    import numpy as np
    scale = n_in / n_out
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(src)
    w1 = src - x0
    A = np.zeros((n_out, n_in), dtype=np.float32)
    i0 = np.clip(x0.astype(np.int64), 0, n_in - 1)
    i1 = np.clip(x0.astype(np.int64) + 1, 0, n_in - 1)
    np.add.at(A, (np.arange(n_out), i0), (1.0 - w1).astype(np.float32))
    np.add.at(A, (np.arange(n_out), i1), w1.astype(np.float32))
    return A


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (align_corners=False), the
    semantics of the reference's `F.interpolate(mode='bilinear')`
    (reference: models/models.py:119, 146, 154, 161).

    Implemented as two separable dense matmuls (out = A_h @ x @ A_w^T): on TPU
    this rides the MXU instead of the gather units, and the interpolation
    matrices are trace-time constants. No antialiasing on downscale, matching
    the reference exactly (unlike `jax.image.resize`'s triangle kernel).
    """
    B, H, W, C = x.shape
    if H == height and W == width:
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if H != height:
        Ah = jnp.asarray(_linear_resize_matrix(H, height))
        xf = jnp.einsum("oh,bhwc->bowc", Ah, xf)
    if W != width:
        Aw = jnp.asarray(_linear_resize_matrix(W, width))
        xf = jnp.einsum("ow,bhwc->bhoc", Aw, xf)
    return xf.astype(dtype)
