"""Model-level tests: shapes, anytime semantics, gradients, dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwsnet_tpu import LWSNet, ModelConfig

CFG = ModelConfig(compute_dtype="float32")
H, W = 32, 64


@pytest.fixture(scope="module")
def model_and_vars():
    model = LWSNet(CFG)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((2, H, W, 3)), dtype=jnp.float32)
    right = jnp.asarray(rng.standard_normal((2, H, W, 3)), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, right)
    return model, variables, left, right


def test_forward_shapes(model_and_vars):
    model, variables, left, right = model_and_vars
    outs = model.apply(variables, left, right)
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (2, H, W, 1)
        assert o.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(o)))


def test_anytime_prefix_consistency(model_and_vars):
    """Stage-k output must be identical whether we request k or 4 stages —
    the anytime contract (reference: models/models.py:106-164 always computes
    all four; we prune at trace time)."""
    model, variables, left, right = model_and_vars
    full = model.apply(variables, left, right, num_stages=4)
    for k in (1, 2, 3):
        partial = model.apply(variables, left, right, num_stages=k)
        assert len(partial) == k
        np.testing.assert_allclose(
            np.asarray(partial[-1]), np.asarray(full[k - 1]), atol=1e-6)


def test_stage1_disparity_range(model_and_vars):
    """Stage-1 soft-argmin output lies in [0, 23] * upsample-scale bounds
    (bins are [0,24) at 1/8 res scaled by 8, reference: models/models.py:142-145)."""
    model, variables, left, right = model_and_vars
    out = model.apply(variables, left, right, num_stages=1)[0]
    arr = np.asarray(out)
    assert arr.min() >= 0.0 - 1e-3
    assert arr.max() <= 23.0 * 8 + 1e-3


def test_gradients_flow(model_and_vars):
    model, variables, left, right = model_and_vars
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        outs, _ = model.apply(
            {"params": p, **others}, left, right, train=True,
            mutable=["batch_stats"])
        return sum(jnp.mean(jnp.abs(o)) for o in outs)

    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


def test_batch_stats_update_in_train_mode(model_and_vars):
    model, variables, left, right = model_and_vars
    _, mutated = model.apply(variables, left, right, train=True,
                             mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = sum(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed > 0


def test_bfloat16_close_to_float32(model_and_vars):
    model, variables, left, right = model_and_vars
    bf_model = LWSNet(ModelConfig(compute_dtype="bfloat16"))
    outs32 = model.apply(variables, left, right)
    outs16 = bf_model.apply(variables, left, right)
    for a, b in zip(outs32, outs16):
        assert b.dtype == jnp.float32  # outputs are always f32
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        # Untrained outputs are chaotic (softmax over random costs amplifies
        # rounding), so bound the *mean* deviation relative to output range.
        rng_span = a.max() - a.min() + 1.0
        assert np.abs(a - b).mean() < 0.02 * rng_span


def test_odd_input_dims_rejected(model_and_vars):
    model, variables, _, _ = model_and_vars
    bad = jnp.zeros((1, 30, 64, 3))
    with pytest.raises(AssertionError):
        model.apply(variables, bad, bad)


def test_conv3d_single_layer_parity():
    """Single-layer parity across the three BNReLUConv3D formulations is
    tight allclose — a localized discrepancy (e.g. a boundary-row bug) cannot
    hide behind the end-to-end mean-abs tolerance below."""
    from lwsnet_tpu.models.blocks import BNReLUConv3D
    rng = np.random.default_rng(7)
    B, D, Hh, Ww, C, Co = 2, 9, 8, 16, 4, 8
    x = jnp.asarray(rng.standard_normal((B, D, Hh, Ww, C)), jnp.float32)
    outs = {}
    for impl in ("xla3d", "kdbatch", "folded"):
        m = BNReLUConv3D(Co, impl=impl)
        xin = jnp.transpose(x, (0, 2, 3, 1, 4)) if impl == "folded" else x
        v = m.init(jax.random.PRNGKey(1), xin)
        y = m.apply(v, xin)
        if impl == "folded":
            y = jnp.transpose(y, (0, 3, 1, 2, 4))
        outs[impl] = np.asarray(y)
    np.testing.assert_allclose(outs["kdbatch"], outs["xla3d"],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(outs["folded"], outs["xla3d"],
                               atol=1e-5, rtol=1e-5)


def test_conv3d_impl_parity(model_and_vars):
    """The folded / kdbatch 3D-filter formulations must match the xla3d
    oracle on identical variables (single-layer parity is exact; end-to-end
    deviations are softmax-amplified reorder rounding)."""
    _, variables, left, right = model_and_vars
    outs = {}
    for impl in ("xla3d", "auto"):
        m = LWSNet(ModelConfig(compute_dtype="float32", conv3d_impl=impl))
        outs[impl] = m.apply(variables, left, right)
    for a, b in zip(outs["xla3d"], outs["auto"]):
        a, b = np.asarray(a), np.asarray(b)
        span = a.max() - a.min() + 1.0
        assert np.abs(a - b).mean() < 0.01 * span
