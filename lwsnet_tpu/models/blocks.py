"""Conv/BN building blocks, NHWC, TPU-first.

Functional equivalents of the reference's Paddle blocks
(reference: models/submodules.py:5-33, 190-280) re-designed for XLA:

* NHWC layout everywhere (TPU conv layout; channels on the 128-lane axis).
* Bias-free convolutions + BatchNorm, He-normal init, matching the reference's
  `convbn`/`deconvbn` (reference: models/submodules.py:10-18, 25-33).
* BatchNorm statistics are computed in float32 regardless of compute dtype and,
  under pjit with a batch-sharded input, are automatically *global* (sync-BN):
  XLA turns the batch-mean into a cross-device reduction. The reference's
  single-GPU per-device stats are the degenerate case of this.
* Transposed conv implemented directly with `lax.conv_general_dilated`
  (lhs_dilation = stride), with the exact padding arithmetic of a
  k3/s2/p1/output_padding1 transposed conv so a converted reference
  checkpoint reproduces shapes bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# He-normal (Kaiming) init, matching reference: models/submodules.py:45 etc.
kaiming = nn.initializers.he_normal()


def _pad_for(kernel: int, dilation: int, padding: int) -> int:
    """Reference quirk: padding = dilation whenever dilation > 1
    (reference: models/submodules.py:14, 232, 250)."""
    return dilation if dilation > 1 else padding


class ConvBN(nn.Module):
    """Conv2D (no bias) + BatchNorm  (reference: models/submodules.py:5-18)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = _pad_for(self.kernel, self.dilation, self.padding)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=kaiming,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)
        return x.astype(self.dtype)


class DeconvBN(nn.Module):
    """Transposed Conv2D (no bias) + BatchNorm
    (reference: models/submodules.py:20-33; always k3/s2/p1/output_padding=1,
    which exactly doubles each spatial dim).

    Implemented as `conv_general_dilated` with lhs_dilation = stride and
    padding (k-1-p, k-1-p+output_padding) = (1, 2) per spatial dim. The kernel
    is stored in HWIO correlation orientation; a Paddle->JAX weight converter
    must flip the spatial axes and swap I/O channels of `.weight`.
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        w = self.param(
            "kernel", kaiming, (self.kernel, self.kernel, in_ch, self.features),
            jnp.float32,
        )
        lo = self.kernel - 1 - self.padding
        hi = self.kernel - 1 - self.padding + self.output_padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(lo, hi), (lo, hi)],
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(y)
        return y.astype(self.dtype)


class PreConv(nn.Module):
    """BN + ReLU + dilated Conv2D  (reference: models/submodules.py:223-235)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(x)
        x = nn.relu(x).astype(self.dtype)
        p = _pad_for(self.kernel, self.dilation, self.padding)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            kernel_init=kaiming,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class PreConvDW(nn.Module):
    """BN + ReLU + depthwise dilated 3x3 + pointwise 1x1
    (reference: models/submodules.py:238-280).

    On TPU the depthwise 3x3 runs on the VPU and the 1x1 on the MXU; XLA fuses
    the BN+ReLU into the depthwise conv's input.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(x)
        x = nn.relu(x).astype(self.dtype)
        p = _pad_for(self.kernel, self.dilation, self.padding)
        x = nn.Conv(  # depthwise
            in_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=in_ch,
            use_bias=False,
            kernel_init=kaiming,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return nn.Conv(  # pointwise
            self.features, (1, 1), use_bias=False, kernel_init=kaiming,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)


class BNReLUConv3D(nn.Module):
    """BN3D + ReLU + Conv3D over (B, D, H, W, C) volumes
    (reference: models/submodules.py:190-214).

    XLA lowers the 3-spatial-dim conv onto the MXU as a batched matmul over
    the 27-tap neighborhood; channels (<=32 here) sit on the lane axis.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(x)
        x = nn.relu(x).astype(self.dtype)
        k, p, s = self.kernel, self.padding, self.stride
        return nn.Conv(
            self.features,
            (k, k, k),
            strides=(s, s, s),
            padding=[(p, p), (p, p), (p, p)],
            use_bias=False,
            kernel_init=kaiming,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class CostFilter3D(nn.Module):
    """The per-stage 3D-CNN cost filter `post_3dconvs`
    (reference: models/submodules.py:216-221): 1->C, layers x (C->C), C->1,
    each as BN+ReLU+Conv3D. Applied with an identity skip by the caller
    (reference: models/models.py:137)."""

    layers: int
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BNReLUConv3D(self.channels, dtype=self.dtype)(x, train)
        for _ in range(self.layers):
            x = BNReLUConv3D(self.channels, dtype=self.dtype)(x, train)
        return BNReLUConv3D(1, dtype=self.dtype)(x, train)
