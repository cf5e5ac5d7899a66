"""Interpret-mode parity tests for the fused cost-filter + soft-argmin
kernel (`lwsnet_tpu.ops.pallas.costfilter`) against the XLA oracle
(`CostFilter3D` eval mode + `stereo.soft_argmin`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwsnet_tpu.models import blocks
from lwsnet_tpu.ops import stereo
from lwsnet_tpu.ops.pallas import costfilter


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _jitter_stats(variables, rng):
    flat, treedef = jax.tree_util.tree_flatten_with_path(
        variables["batch_stats"])
    new = []
    for path, leaf in flat:
        is_var = any(getattr(p, "key", None) == "var" for p in path)
        if is_var:
            new.append(jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape),
                                   leaf.dtype))
        else:
            new.append(jnp.asarray(rng.normal(0.0, 0.1, leaf.shape),
                                   leaf.dtype))
    return {"params": variables["params"],
            "batch_stats": jax.tree_util.tree_unflatten(treedef, new)}


@pytest.mark.parametrize("case", [
    # (B, H, W, D, layers, channels, start)
    (2, 8, 12, 6, 2, 8, 0),     # folded-D path ((D+2)*C <= 128)
    (1, 6, 10, 9, 1, 4, -4),    # folded-D path, residual bins
    (1, 8, 12, 6, 2, 24, 0),    # d-grid path ((D+2)*C = 192 > 128)
    (1, 16, 24, 24, 4, 32, 0),  # d-grid path at the real stage-1 config
                                # (D=24, C=32, 6 layers; small spatial)
])
def test_filter_soft_argmin_parity(rng, case):
    B, H, W, D, layers, channels, start = case
    cost = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
    filt = blocks.CostFilter3D(layers=layers, channels=channels,
                               impl="xla3d", dtype=jnp.float32)
    variables = _jitter_stats(filt.init(jax.random.PRNGKey(0), cost), rng)

    filtered = filt.apply(variables, cost, train=False)
    want = stereo.soft_argmin(filtered + cost, start, start + D)

    got = costfilter.filter_soft_argmin(
        cost, variables["params"], variables["batch_stats"], layers=layers,
        channels=channels, start=start, dtype=jnp.float32, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_filter_soft_argmin_bf16(rng):
    """bf16 path stays close to the f32 oracle (per-layer rounding only)."""
    B, H, W, D = 1, 8, 12, 6
    cost = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
    filt = blocks.CostFilter3D(layers=2, channels=8, impl="xla3d",
                               dtype=jnp.float32)
    variables = _jitter_stats(filt.init(jax.random.PRNGKey(0), cost), rng)
    filtered = filt.apply(variables, cost, train=False)
    want = np.asarray(stereo.soft_argmin(filtered + cost, 0, D))

    got = np.asarray(costfilter.filter_soft_argmin(
        cost, variables["params"], variables["batch_stats"], layers=2,
        channels=8, start=0, dtype=jnp.bfloat16, interpret=True))
    span = want.max() - want.min() + 1e-6
    assert np.abs(got - want).mean() < 0.05 * span
