"""Color-guidance refinement towers (stage 4), NHWC.

Re-design of the reference's `refinement1`/`refinement2`
(reference: models/submodules.py:282-326, wired at models/models.py:158-162):
two full-resolution towers (one over the left RGB image, one over the stage-3
disparity) of depthwise-separable dilated convs, concatenated and reduced to a
1-channel residual added to the stage-3 disparity.

These run at full image resolution — the widest feature maps in the network —
so the depthwise 3x3s (VPU) + 1x1s (MXU) split is exactly what TPU wants; XLA
fuses each BN+ReLU into the following conv.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from lwsnet_tpu.models.blocks import (PreConv, PreConvDW, conv3x3_shift_mm,
                                      kaiming)


class RefinementTower(nn.Module):
    """`refinement1`: 3x3 conv then 4 depthwise-separable convs with dilations
    2, 4, 8, 16 (reference: models/submodules.py:282-300)."""

    features: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            kernel_init=kaiming, dtype=self.dtype, param_dtype=jnp.float32,
        )(x.astype(self.dtype))
        for k in range(4):
            x = PreConvDW(self.features, dilation=2 ** (k + 1),
                          dtype=self.dtype)(x, train)
        return x


class RefinementHead(nn.Module):
    """`refinement2`: preconv d=8, 4 depthwise-separable convs with dilations
    8, 4, 2, 1, then a 3x3 conv to 1 channel
    (reference: models/submodules.py:302-326)."""

    features: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PreConv(self.features, dilation=8, dtype=self.dtype)(x, train)
        for k in reversed(range(4)):
            x = PreConvDW(self.features, dilation=2 ** k,
                          dtype=self.dtype)(x, train)
        # 3x3 -> 1 channel: XLA's conv is pathological for 1 output channel at
        # full res (0.91 ms vs 0.14 ms as 9 shifted matmuls on v5e).
        k_out = self.param("out_kernel", kaiming, (3, 3, self.features, 1),
                           jnp.float32)
        return conv3x3_shift_mm(x, k_out.astype(self.dtype))
