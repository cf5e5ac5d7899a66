"""Loss/metric tests against torch oracles and hand-computed cases."""

import jax.numpy as jnp
import numpy as np
import pytest

try:
    import torch
except Exception as _e:  # ImportError, or OSError on a degraded disk
    pytest.skip(f"torch unavailable: {_e}", allow_module_level=True)
import torch.nn.functional as tF  # noqa: E402

from lwsnet_tpu.training import losses, metrics


def test_smooth_l1_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype(np.float32) * 3
    ours = np.asarray(losses.smooth_l1(jnp.asarray(x)))
    ref = tF.smooth_l1_loss(torch.from_numpy(x), torch.zeros(1000),
                            reduction="none").numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_staged_loss_matches_masked_select_formulation():
    """Mask-and-normalize must equal the reference's masked_select + mean
    (reference: train.py:145-152)."""
    rng = np.random.default_rng(1)
    B, H, W = 2, 8, 10
    gt = rng.uniform(0, 250, (B, H, W)).astype(np.float32)
    outs = [rng.uniform(0, 200, (B, H, W, 1)).astype(np.float32)
            for _ in range(4)]
    weights = (0.25, 0.5, 1.0, 1.0)

    total, per_stage = losses.staged_loss(outs, jnp.asarray(gt), weights,
                                          max_disp=192.0)

    mask = gt < 192.0
    want_total = 0.0
    for w, o in zip(weights, outs):
        sel = tF.smooth_l1_loss(torch.from_numpy(o[..., 0][mask]),
                                torch.from_numpy(gt[mask]),
                                reduction="mean").item()
        want_total += w * sel
    np.testing.assert_allclose(float(total), want_total, rtol=1e-5)
    # per_stage entries are the de-weighted values (reference: train.py:150)
    np.testing.assert_allclose(float(per_stage[0]) * weights[0] +
                               float(per_stage[1]) * weights[1] +
                               float(per_stage[2]) * weights[2] +
                               float(per_stage[3]) * weights[3],
                               want_total, rtol=1e-5)


def test_finetune_mask_gt_positive():
    """Finetune masks gt > 0 (sparse KITTI GT, reference: finetune.py:153)."""
    gt = np.array([[[0.0, 5.0], [0.0, 10.0]]], dtype=np.float32)
    pred = [np.full((1, 2, 2, 1), 7.0, dtype=np.float32)]
    total, _ = losses.staged_loss(pred, jnp.asarray(gt), (1.0,), min_disp=0.0)
    # valid pixels: 5 and 10 -> |7-5|=2 -> 1.5 smooth-l1; |7-10|=3 -> 2.5
    np.testing.assert_allclose(float(total), (1.5 + 2.5) / 2, rtol=1e-6)


def test_epe_and_d1_reference_semantics():
    """EPE: mean |err| where gt < maxdisp (reference: train.py:180-190).
    D1: err>3 AND err/gt>5% over 0<gt<192 (reference: finetune.py:212-219)."""
    gt = np.array([[[10.0, 100.0, 300.0, 50.0]]], dtype=np.float32)
    pred = np.array([[[14.0, 102.0, 300.0, 50.5]]], dtype=np.float32)

    # gt=300 excluded by maxdisp; errors 4, 2, 0.5
    np.testing.assert_allclose(
        float(metrics.epe(jnp.asarray(pred), jnp.asarray(gt))),
        (4.0 + 2.0 + 0.5) / 3, rtol=1e-6)

    # D1: only err=4 at gt=10 satisfies >3px AND >5% -> 1/3
    np.testing.assert_allclose(
        float(metrics.d1_error(jnp.asarray(pred), jnp.asarray(gt))),
        1.0 / 3, rtol=1e-4)


def test_d1_large_error_small_ratio_not_counted():
    # err=4 > 3px but 4/100=4% < 5% -> not a D1 outlier
    gt = np.array([[[100.0]]], dtype=np.float32)
    pred = np.array([[[104.0]]], dtype=np.float32)
    assert float(metrics.d1_error(jnp.asarray(pred), jnp.asarray(gt))) < 1e-6


def test_average_meter():
    m = metrics.AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.val == 4.0
    assert m.count == 4
    np.testing.assert_allclose(m.avg, (2.0 + 12.0) / 4)
