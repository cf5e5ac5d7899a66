"""Dilated-CNN + hourglass feature extractor, NHWC.

Re-design of the reference's `feature_extraction`/`hourglass`
(reference: models/submodules.py:35-188). Produces the three-scale feature
pyramid [1/8 @ 16ch, 1/4 @ 16ch, 1/2 @ 8ch] consumed by the cascade.

The network is tiny (8/16 channels), so on TPU the win is keeping everything
in one fused XLA computation: both the left and right image pass through the
same weights, which the model applies as a single batched call (stack left
and right on the batch axis) so each conv runs once at 2B batch — better MXU
utilization than two B-sized calls.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from lwsnet_tpu.models.blocks import ConvBN, DeconvBN, kaiming


class Hourglass(nn.Module):
    """Encoder-decoder over the 1/2-res feature map
    (reference: models/submodules.py:35-109). Emits [1/8@2C, 1/4@2C, 1/2@C]."""

    init_channels: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        c = self.init_channels
        # conv1: 1/2 -> 1/4, C -> 2C (reference: models/submodules.py:40-47)
        out = nn.relu(ConvBN(c * 2, stride=2, dtype=self.dtype)(x, train))
        # conv2: 1/4 -> 1/4 (reference: models/submodules.py:49-56)
        pre = nn.relu(ConvBN(c * 2, dtype=self.dtype)(out, train))
        # conv3: 1/4 -> 1/8 (reference: models/submodules.py:58-65)
        out = nn.relu(ConvBN(c * 2, stride=2, dtype=self.dtype)(pre, train))
        # conv4: 1/8 -> 1/8 (reference: models/submodules.py:67-74)
        feat8 = nn.relu(ConvBN(c * 2, dtype=self.dtype)(out, train))
        # conv5 (deconv): 1/8 -> 1/4, + conv2 skip (reference: models/submodules.py:76-83, 103)
        feat4 = nn.relu(DeconvBN(c * 2, dtype=self.dtype)(feat8, train) + pre)
        # conv6 (deconv): 1/4 -> 1/2, 2C -> C (reference: models/submodules.py:85-92, 106)
        feat2 = DeconvBN(c, dtype=self.dtype)(feat4, train)
        return [feat8, feat4, feat2]


class FeatureExtractor(nn.Module):
    """Full extractor (reference: models/submodules.py:113-188).

    dres0: 3->C/2 (k3 s2 d2) -> C/2->C (k3 s1 d4), halves resolution.
    dres1: residual dilated block (C->C/2->C, d2), added to its input.
    dres2: hourglass; its 1/2-res output gets a skip from dres1's output.
    classif1: C->C head on the 1/2-res map.
    Returns [1/8 @ 2C, 1/4 @ 2C, 1/2 @ C] with C = base channels (8).
    """

    channels: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        c = self.channels
        # dres0 (reference: models/submodules.py:118-135)
        out = nn.relu(ConvBN(c // 2, stride=2, dilation=2, dtype=self.dtype)(x, train))
        out = nn.relu(ConvBN(c, dilation=4, dtype=self.dtype)(out, train))
        # dres1 + identity skip (reference: models/submodules.py:137-153, :179)
        res = nn.relu(ConvBN(c // 2, dilation=2, dtype=self.dtype)(out, train))
        res = ConvBN(c, dilation=2, dtype=self.dtype)(res, train)
        out = res + out
        # dres2 hourglass + 1/2-res skip (reference: models/submodules.py:181-182)
        feat8, feat4, feat2 = Hourglass(c, dtype=self.dtype)(out, train)
        feat2 = feat2 + out
        # classif1 head (reference: models/submodules.py:157-172, :184)
        feat2 = nn.relu(ConvBN(c, dtype=self.dtype)(feat2, train))
        feat2 = nn.Conv(
            c, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            kernel_init=kaiming, dtype=self.dtype, param_dtype=jnp.float32,
        )(feat2)
        return [feat8, feat4, feat2]
