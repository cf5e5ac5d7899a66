"""Paddle `.pdparams` -> Flax variables converter.

The reference releases its trained weights as Paddle pickled state dicts
(reference: README.md:121-123, saved at train.py:113-115). `paddle.save` on a
state dict writes a plain pickle of `{dotted.attribute.path: numpy array}`,
so the file is readable without Paddle installed; this module maps those
entries onto the LWSNet Flax tree so a released checkpoint can drive the
golden-pair parity harness.

Layout conversions (Paddle -> Flax):
  Conv2D          OIHW (o, i, kh, kw)      -> HWIO (kh, kw, i, o)
  depthwise Conv2D (c, 1, kh, kw)          -> (kh, kw, 1, c)
  Conv3D          (o, i, kd, kh, kw)       -> DHWIO (kd, kh, kw, i, o)
  Conv2DTranspose (i, o, kh, kw)           -> HWIO (kh, kw, i, o), spatial
                  axes FLIPPED: DeconvBN runs an lhs-dilated *correlation*
                  (lwsnet_tpu.models.blocks.DeconvBN), and a transposed
                  convolution is the lhs-dilated *convolution* with the same
                  kernel (models/blocks.py:132-134).
  BatchNorm       weight/bias/_mean/_variance -> scale/bias + mean/var stats

Name map: the reference module tree (reference: models/models.py:16-26,
models/submodules.py:113-188, 216-221, 282-326) against the Flax tree of
`lwsnet_tpu.models.lwsnet.LWSNet` (auto-numbered linen submodules).
"""

from __future__ import annotations

import pickle
from typing import Dict, Tuple

import numpy as np


def load_paddle_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a `.pdparams` pickle without Paddle. Values are coerced to
    numpy; Paddle-internal classes in the stream (older save formats wrap
    tensors) are tolerated by substituting a passthrough stub."""

    class _Stub:  # stands in for any paddle.* class in the pickle stream
        def __init__(self, *a, **k):
            self.args = a

        def __setstate__(self, state):
            self.state = state

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".")[0] in ("paddle", "fluid"):
                return _Stub
            return super().find_class(module, name)

    with open(path, "rb") as f:
        obj = _Unpickler(f).load()
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a pickled state dict, "
                         f"got {type(obj)}")
    out = {}
    for k, v in obj.items():
        if isinstance(v, _Stub):  # unwrap tensor stubs that carry an array
            arrs = [x for x in getattr(v, "args", ()) +
                    tuple(getattr(v, "state", ()) or ())
                    if isinstance(x, np.ndarray)]
            if not arrs:
                raise ValueError(f"{path}: cannot extract array for key {k}")
            v = arrs[0]
        out[str(k)] = np.asarray(v)
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO (also handles the depthwise (c,1,kh,kw) case)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv3d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _deconv(w: np.ndarray) -> np.ndarray:
    """(i, o, kh, kw) -> spatially flipped HWIO."""
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def paddle_to_flax(sd: Dict[str, np.ndarray],
                   strict: bool = True) -> Tuple[dict, dict]:
    """Convert a reference LWSNet Paddle state dict to Flax
    ({"params": ...}, {"batch_stats": ...}) trees (float32).

    strict=True raises if any reference key goes unconsumed (catching
    renamed/missing entries instead of silently dropping weights).
    """
    sd = dict(sd)  # consumed keys are popped
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value, np.float32)

    def put_bn(flax_prefix: str, pd_prefix: str):
        put(params, f"{flax_prefix}/scale", sd.pop(f"{pd_prefix}.weight"))
        put(params, f"{flax_prefix}/bias", sd.pop(f"{pd_prefix}.bias"))
        put(stats, f"{flax_prefix}/mean", sd.pop(f"{pd_prefix}._mean"))
        put(stats, f"{flax_prefix}/var", sd.pop(f"{pd_prefix}._variance"))

    fe, fx = "feature_extraction", "FeatureExtractor_0"
    # dres0/dres1 -> ConvBN_0..3 (reference: models/submodules.py:118-153)
    for i, (blk, idx) in enumerate(
            [("dres0", 0), ("dres0", 2), ("dres1", 0), ("dres1", 2)]):
        put(params, f"{fx}/ConvBN_{i}/Conv_0/kernel",
            _conv(sd.pop(f"{fe}.{blk}.{idx}.0.weight")))
        put_bn(f"{fx}/ConvBN_{i}/BatchNorm_0", f"{fe}.{blk}.{idx}.1")
    # classif1 -> ConvBN_4 + plain Conv_0 (reference: models/submodules.py:157-172)
    put(params, f"{fx}/ConvBN_4/Conv_0/kernel",
        _conv(sd.pop(f"{fe}.classif1.0.0.weight")))
    put_bn(f"{fx}/ConvBN_4/BatchNorm_0", f"{fe}.classif1.0.1")
    put(params, f"{fx}/Conv_0/kernel", _conv(sd.pop(f"{fe}.classif1.2.weight")))
    # hourglass (reference: models/submodules.py:35-92)
    hg = f"{fx}/Hourglass_0"
    for i in range(4):
        put(params, f"{hg}/ConvBN_{i}/Conv_0/kernel",
            _conv(sd.pop(f"{fe}.dres2.conv{i + 1}.0.0.weight")))
        put_bn(f"{hg}/ConvBN_{i}/BatchNorm_0", f"{fe}.dres2.conv{i + 1}.0.1")
    for i in range(2):
        put(params, f"{hg}/DeconvBN_{i}/kernel",
            _deconv(sd.pop(f"{fe}.dres2.conv{i + 5}.0.weight")))
        put_bn(f"{hg}/DeconvBN_{i}/BatchNorm_0", f"{fe}.dres2.conv{i + 5}.1")

    # 3D cost filters (reference: models/submodules.py:216-221, LayerList at
    # models/models.py:17-22)
    for i in range(3):
        for j in range(6):
            put(params, f"CostFilter3D_{i}/BNReLUConv3D_{j}/kernel",
                _conv3d(sd.pop(f"volume_postprocess.{i}.{j}.2.weight")))
            put_bn(f"CostFilter3D_{i}/BNReLUConv3D_{j}/BatchNorm_0",
                   f"volume_postprocess.{i}.{j}.0")

    # refinement towers (reference: models/submodules.py:282-300)
    for tower, pd in (("RefinementTower_0", "refinement1_left"),
                      ("RefinementTower_1", "refinement1_disp")):
        put(params, f"{tower}/Conv_0/kernel", _conv(sd.pop(f"{pd}.0.weight")))
        for k in range(4):
            put(params, f"{tower}/PreConvDW_{k}/dw_kernel",
                _conv(sd.pop(f"{pd}.{k + 1}.2.weight")))
            put(params, f"{tower}/PreConvDW_{k}/Conv_0/kernel",
                _conv(sd.pop(f"{pd}.{k + 1}.3.weight")))
            put_bn(f"{tower}/PreConvDW_{k}/BatchNorm_0", f"{pd}.{k + 1}.0")

    # refinement head (reference: models/submodules.py:302-326)
    head = "RefinementHead_0"
    put(params, f"{head}/PreConv_0/Conv_0/kernel",
        _conv(sd.pop("refinement2.0.2.weight")))
    put_bn(f"{head}/PreConv_0/BatchNorm_0", "refinement2.0.0")
    for k in range(4):
        put(params, f"{head}/PreConvDW_{k}/dw_kernel",
            _conv(sd.pop(f"refinement2.{k + 1}.2.weight")))
        put(params, f"{head}/PreConvDW_{k}/Conv_0/kernel",
            _conv(sd.pop(f"refinement2.{k + 1}.3.weight")))
        put_bn(f"{head}/PreConvDW_{k}/BatchNorm_0", f"refinement2.{k + 1}.0")
    put(params, f"{head}/out_kernel", _conv(sd.pop("refinement2.5.weight")))

    if strict and sd:
        raise ValueError(f"unconsumed reference keys: {sorted(sd)[:10]}"
                         f"{' ...' if len(sd) > 10 else ''}")
    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str) -> dict:
    """One-call: `.pdparams` file -> LWSNet Flax variables."""
    return paddle_to_flax(load_paddle_state_dict(path))
