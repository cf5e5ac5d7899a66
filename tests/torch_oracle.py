"""Torch reimplementation of the reference LWSNet, used as a whole-model
numerical oracle.

This mirrors the *semantics* of the reference PaddlePaddle network
(reference: models/models.py, models/submodules.py) in torch, NCHW, eval
mode, with Paddle-compatible state-dict key names — so a synthetic
Paddle-style state dict can drive BOTH this oracle and the
`lwsnet_tpu.convert` -> Flax path, proving end-to-end functional parity of
the JAX model + converter with the reference architecture.

torch/paddle correspondence used here (APIs are drop-in):
  paddle.nn.Conv2D/Conv3D/Conv2DTranspose -> torch.nn.Conv2d/Conv3d/
    ConvTranspose2d (same OIHW / (in,out,kh,kw) weight layouts)
  paddle BatchNorm eps 1e-5, eval mode -> torch BatchNorm eval mode
  paddle F.grid_sample(align_corners=True default) -> torch grid_sample
    with align_corners=True (reference: models/models.py:53)
  paddle F.interpolate(mode='bilinear', align_corners=False default) ->
    torch interpolate(align_corners=False)
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

MAXDISPLIST = (24, 5, 5)
LAYERS_3D = 4
CHANNELS_3D = 8
GROWTH_RATE = (4, 1, 1)


def convbn(ci, co, k, s, p, d=1):
    # reference: models/submodules.py:5-18 (padding=dilation when d>1)
    return nn.Sequential(
        nn.Conv2d(ci, co, k, s, padding=d if d > 1 else p, dilation=d,
                  bias=False),
        nn.BatchNorm2d(co))


def deconvbn(ci, co):
    # reference: models/submodules.py:20-33 (always k3/s2/p1/op1)
    return nn.Sequential(
        nn.ConvTranspose2d(ci, co, 3, stride=2, padding=1, output_padding=1,
                           bias=False),
        nn.BatchNorm2d(co))


class Hourglass(nn.Module):
    # reference: models/submodules.py:35-109
    def __init__(self, c=8):
        super().__init__()
        self.conv1 = nn.Sequential(convbn(c, 2 * c, 3, 2, 1), nn.ReLU())
        self.conv2 = nn.Sequential(convbn(2 * c, 2 * c, 3, 1, 1), nn.ReLU())
        self.conv3 = nn.Sequential(convbn(2 * c, 2 * c, 3, 2, 1), nn.ReLU())
        self.conv4 = nn.Sequential(convbn(2 * c, 2 * c, 3, 1, 1), nn.ReLU())
        self.conv5 = deconvbn(2 * c, 2 * c)
        self.conv6 = deconvbn(2 * c, c)

    def forward(self, x):
        out = self.conv1(x)
        pre = self.conv2(out)
        out = self.conv4(self.conv3(pre))
        feat8 = out
        feat4 = F.relu(self.conv5(out) + pre)
        feat2 = self.conv6(feat4)
        return [feat8, feat4, feat2]


class FeatureExtraction(nn.Module):
    # reference: models/submodules.py:113-188
    def __init__(self):
        super().__init__()
        self.dres0 = nn.Sequential(convbn(3, 4, 3, 2, 1, d=2), nn.ReLU(),
                                   convbn(4, 8, 3, 1, 1, d=4), nn.ReLU())
        self.dres1 = nn.Sequential(convbn(8, 4, 3, 1, 1, d=2), nn.ReLU(),
                                   convbn(4, 8, 3, 1, 1, d=2))
        self.dres2 = Hourglass(8)
        self.classif1 = nn.Sequential(convbn(8, 8, 3, 1, 1), nn.ReLU(),
                                      nn.Conv2d(8, 8, 3, 1, 1, bias=False))

    def forward(self, x):
        out = self.dres0(x)
        out = self.dres1(out) + out
        res = self.dres2(out)
        res[-1] = self.classif1(res[-1] + out)
        return res


def batch_relu_conv3d(ci, co):
    # reference: models/submodules.py:190-214
    return nn.Sequential(nn.BatchNorm3d(ci), nn.ReLU(),
                         nn.Conv3d(ci, co, 3, padding=1, bias=False))


def post_3dconvs(layers, channels):
    # reference: models/submodules.py:216-221
    net = ([batch_relu_conv3d(1, channels)]
           + [batch_relu_conv3d(channels, channels) for _ in range(layers)]
           + [batch_relu_conv3d(channels, 1)])
    return nn.Sequential(*net)


def preconv2d(ci, co, d):
    # reference: models/submodules.py:223-235
    return nn.Sequential(nn.BatchNorm2d(ci), nn.ReLU(),
                         nn.Conv2d(ci, co, 3, 1, padding=d if d > 1 else 1,
                                   dilation=d, bias=False))


def preconv2d_dwsep(ci, co, d):
    # reference: models/submodules.py:238-261
    return nn.Sequential(
        nn.BatchNorm2d(ci), nn.ReLU(),
        nn.Conv2d(ci, ci, 3, 1, padding=d if d > 1 else 1, dilation=d,
                  groups=ci, bias=False),
        nn.Conv2d(ci, co, 1, bias=False))


def refinement1(ci, co=32):
    # reference: models/submodules.py:282-300
    net = [nn.Conv2d(ci, co, 3, 1, 1, bias=False)]
    net += [preconv2d_dwsep(co, co, 2 ** (k + 1)) for k in range(4)]
    return nn.Sequential(*net)


def refinement2(ci=64, co=32):
    # reference: models/submodules.py:302-326
    net = [preconv2d(ci, co, 8)]
    net += [preconv2d_dwsep(co, co, 2 ** k) for k in reversed(range(4))]
    net += [nn.Conv2d(co, 1, 3, 1, 1, bias=False)]
    return nn.Sequential(*net)


class TorchLWSNet(nn.Module):
    """The reference cascade (reference: models/models.py:7-164)."""

    def __init__(self):
        super().__init__()
        self.feature_extraction = FeatureExtraction()
        self.volume_postprocess = nn.ModuleList(
            [post_3dconvs(LAYERS_3D, CHANNELS_3D * GROWTH_RATE[i])
             for i in range(3)])
        self.refinement1_left = refinement1(3)
        self.refinement1_disp = refinement1(1)
        self.refinement2 = refinement2()

    @staticmethod
    def warp(x, disp):
        # reference: models/models.py:28-55 (align_corners=True, zeros OOB)
        B, C, H, W = x.shape
        xx = torch.arange(W, dtype=torch.float32).view(1, 1, 1, W).expand(
            B, 1, H, W)
        yy = torch.arange(H, dtype=torch.float32).view(1, 1, H, 1).expand(
            B, 1, H, W)
        gx = 2.0 * (xx - disp) / max(W - 1, 1) - 1.0
        gy = 2.0 * yy / max(H - 1, 1) - 1.0
        grid = torch.cat([gx, gy], dim=1).permute(0, 2, 3, 1)
        return F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                             align_corners=True)

    @staticmethod
    def _volume_2d(fl, fr, maxdisp):
        # reference: models/models.py:58-76
        B, C, H, W = fl.shape
        cost = torch.zeros(B, maxdisp, H, W)
        for d in range(maxdisp):
            if d > 0:
                cost[:, d, :, :d] = fl[:, :, :, :d].abs().sum(1)
                cost[:, d, :, d:] = (fl[:, :, :, d:]
                                     - fr[:, :, :, :-d]).abs().sum(1)
            else:
                cost[:, d] = (fl - fr).abs().sum(1)
        return cost

    def _volume_2d3(self, fl, fr, maxdisp, disp):
        # reference: models/models.py:78-104
        B, C, H, W = fl.shape
        n = 2 * maxdisp - 1
        disp = disp.view(B, 1, 1, H, W).expand(B, n, 1, H, W).reshape(
            -1, 1, H, W)
        shift = torch.arange(-maxdisp + 1, maxdisp, dtype=torch.float32)
        shift = shift.repeat(B).view(-1, 1, 1, 1)
        bl = fl.unsqueeze(1).expand(B, n, C, H, W).reshape(-1, C, H, W)
        br = fr.unsqueeze(1).expand(B, n, C, H, W).reshape(-1, C, H, W)
        cost = (bl - self.warp(br, disp - shift)).abs().sum(1)
        return cost.view(B, n, H, W)

    def forward(self, left, right):
        _, _, H, W = left.shape
        feats_l = self.feature_extraction(left)
        feats_r = self.feature_extraction(right)
        pred = []
        for scale in range(3):
            fl, fr = feats_l[scale], feats_r[scale]
            fh, fw = fl.shape[2], fl.shape[3]
            D = MAXDISPLIST[scale]
            if scale == 0:
                cost = self._volume_2d(fl, fr, D)
            else:
                wflow = F.interpolate(pred[-1], size=(fh, fw),
                                      mode="bilinear",
                                      align_corners=False) * fh / H
                cost = self._volume_2d3(fl, fr, D, wflow.squeeze(1))
            cost = cost.unsqueeze(1)
            cost = self.volume_postprocess[scale](cost) + cost
            cost = cost.squeeze(1)
            probs = F.softmax(-cost, dim=1)
            if scale == 0:
                bins = torch.arange(0, D, dtype=torch.float32)
            else:
                bins = torch.arange(-D + 1, D, dtype=torch.float32)
            low = (probs * bins.view(1, -1, 1, 1)).sum(1, keepdim=True)
            low = low * H / fh
            up = F.interpolate(low, size=(H, W), mode="bilinear",
                               align_corners=False)
            pred.append(up if scale == 0 else up + pred[-1])
        res = self.refinement2(torch.cat(
            [self.refinement1_left(left), self.refinement1_disp(pred[-1])],
            dim=1))
        pred.append(pred[2] + res)
        return pred


def to_paddle_state_dict(model: TorchLWSNet) -> dict:
    """Rename the torch state dict to Paddle conventions: running_mean ->
    _mean, running_var -> _variance, drop num_batches_tracked. Conv /
    ConvTranspose weight layouts already match Paddle's."""
    out = {}
    for k, v in model.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        k = k.replace("running_mean", "_mean").replace(
            "running_var", "_variance")
        out[k] = v.detach().numpy().copy()
    return out
