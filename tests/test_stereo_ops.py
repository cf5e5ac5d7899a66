"""Oracle tests for lwsnet_tpu.ops.stereo.

The warp is checked against torch.nn.functional.grid_sample with the exact
grid construction the reference uses (align_corners=True, zero padding,
reference: models/models.py:28-55). Volumes are checked against naive loops
implementing the reference's strided-write semantics
(reference: models/models.py:58-104).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

try:
    import torch
except Exception as _e:  # ImportError, or OSError on a degraded disk
    pytest.skip(f"torch unavailable: {_e}", allow_module_level=True)
import torch.nn.functional as tF  # noqa: E402

from lwsnet_tpu.ops import stereo


def torch_warp(feat_nchw: np.ndarray, disp: np.ndarray) -> np.ndarray:
    """The reference's grid_sample warp (reference: models/models.py:28-55)."""
    x = torch.from_numpy(feat_nchw)
    d = torch.from_numpy(disp)[:, None]  # (B,1,H,W)
    B, C, H, W = x.shape
    xx = torch.arange(W, dtype=torch.float32).view(1, -1).expand(H, W)
    yy = torch.arange(H, dtype=torch.float32).view(-1, 1).expand(H, W)
    xx = xx.view(1, 1, H, W).expand(B, 1, H, W)
    yy = yy.view(1, 1, H, W).expand(B, 1, H, W)
    grid = torch.cat([xx - d, yy], dim=1)
    grid[:, 0] = 2.0 * grid[:, 0] / max(W - 1, 1) - 1.0
    grid[:, 1] = 2.0 * grid[:, 1] / max(H - 1, 1) - 1.0
    out = tF.grid_sample(x, grid.permute(0, 2, 3, 1), mode="bilinear",
                         padding_mode="zeros", align_corners=True)
    return out.numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_warp_matches_grid_sample(seed):
    rng = np.random.default_rng(seed)
    B, H, W, C = 2, 8, 16, 4
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # Disparities spanning negative, subpixel, and out-of-range values.
    disp = (rng.uniform(-4, W + 4, (B, H, W))).astype(np.float32)

    ours = stereo.horizontal_warp(jnp.asarray(feat), jnp.asarray(disp))
    ref = torch_warp(feat.transpose(0, 3, 1, 2), disp).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_warp_integer_disparity_is_shift():
    rng = np.random.default_rng(2)
    feat = rng.standard_normal((1, 4, 12, 3)).astype(np.float32)
    disp = np.full((1, 4, 12), 3.0, dtype=np.float32)
    out = np.asarray(stereo.horizontal_warp(jnp.asarray(feat), jnp.asarray(disp)))
    np.testing.assert_allclose(out[:, :, 3:], feat[:, :, :-3], atol=1e-6)
    np.testing.assert_allclose(out[:, :, :3], 0.0, atol=1e-6)


def naive_full_volume(fl: np.ndarray, fr: np.ndarray, maxdisp: int) -> np.ndarray:
    """Reference semantics (reference: models/models.py:58-76), NCHW in."""
    B, C, H, W = fl.shape
    cost = np.zeros((B, maxdisp, H, W), dtype=np.float32)
    for d in range(maxdisp):
        if d > 0:
            cost[:, d, :, :d] = np.abs(fl[:, :, :, :d]).sum(1)  # occlusion fill
            cost[:, d, :, d:] = np.abs(fl[:, :, :, d:] - fr[:, :, :, :-d]).sum(1)
        else:
            cost[:, d] = np.abs(fl - fr).sum(1)
    return cost


def test_full_volume_matches_reference_semantics():
    rng = np.random.default_rng(3)
    B, H, W, C, D = 2, 6, 20, 5, 8
    fl = rng.standard_normal((B, H, W, C)).astype(np.float32)
    fr = rng.standard_normal((B, H, W, C)).astype(np.float32)
    ours = np.asarray(stereo.build_cost_volume(jnp.asarray(fl), jnp.asarray(fr), D))
    ref = naive_full_volume(fl.transpose(0, 3, 1, 2), fr.transpose(0, 3, 1, 2), D)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


def naive_residual_volume(fl, fr, disp, maxdisp):
    """Reference semantics (reference: models/models.py:78-104), NCHW in."""
    B, C, H, W = fl.shape
    out = np.zeros((B, 2 * maxdisp - 1, H, W), dtype=np.float32)
    for k in range(2 * maxdisp - 1):
        off = k - maxdisp + 1
        warped = torch_warp(fr, disp - off)
        out[:, k] = np.abs(fl - warped).sum(1)
    return out


def test_residual_volume_matches_reference_semantics():
    rng = np.random.default_rng(4)
    B, H, W, C, D = 2, 6, 20, 4, 3
    fl = rng.standard_normal((B, H, W, C)).astype(np.float32)
    fr = rng.standard_normal((B, H, W, C)).astype(np.float32)
    disp = rng.uniform(0, 8, (B, H, W)).astype(np.float32)
    ours = np.asarray(stereo.build_residual_volume(
        jnp.asarray(fl), jnp.asarray(fr), jnp.asarray(disp), D))
    ref = naive_residual_volume(fl.transpose(0, 3, 1, 2),
                                fr.transpose(0, 3, 1, 2), disp, D)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_soft_argmin_delta_recovers_bin():
    # A cost volume with one near-zero entry and large costs elsewhere puts
    # all softmax(-cost) mass on that bin.
    B, H, W, D = 1, 2, 3, 24
    cost = np.full((B, H, W, D), 50.0, dtype=np.float32)
    cost[0, :, :, 7] = 0.0
    out = np.asarray(stereo.soft_argmin(jnp.asarray(cost), 0, D))
    np.testing.assert_allclose(out, 7.0, atol=1e-3)

    # Residual bins [-D+1, D): index k maps to disparity k - D + 1
    # (reference: models/models.py:151-152).
    D2 = 5
    cost = np.full((B, H, W, 2 * D2 - 1), 50.0, dtype=np.float32)
    cost[0, :, :, 0] = 0.0
    out = np.asarray(stereo.soft_argmin(jnp.asarray(cost), -D2 + 1, D2))
    np.testing.assert_allclose(out, -4.0, atol=1e-3)


def test_soft_argmin_uniform_is_mean():
    B, H, W, D = 1, 2, 2, 24
    cost = np.zeros((B, H, W, D), dtype=np.float32)
    out = np.asarray(stereo.soft_argmin(jnp.asarray(cost), 0, D))
    np.testing.assert_allclose(out, (D - 1) / 2.0, atol=1e-4)


def test_resize_bilinear_matches_torch_align_corners_false():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    ours = np.asarray(stereo.resize_bilinear(jnp.asarray(x), 16, 24))
    ref = tF.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=(16, 24), mode="bilinear",
                         align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # Downscale path (used for wflow, reference: models/models.py:119).
    ours = np.asarray(stereo.resize_bilinear(jnp.asarray(x), 4, 6))
    ref = tF.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=(4, 6), mode="bilinear",
                         align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
