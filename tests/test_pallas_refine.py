"""Interpret-mode parity tests for the fused Pallas refinement kernels.

The XLA modules (`lwsnet_tpu.models.refinement`, eval mode) are the
correctness oracle; the Pallas kernels must reproduce them through the
`refine_pallas` wiring (BN folded to affines, planar layout). Runs on CPU via
`interpret=True` — the same kernel bodies Mosaic compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwsnet_tpu import LWSNet, ModelConfig
from lwsnet_tpu.inference import make_forward
from lwsnet_tpu.models import blocks
from lwsnet_tpu.ops.pallas import refine as K

H, W = 48, 96


def _jittered_variables(model, left, right, rng):
    """Init variables, then randomize BN running stats so the inference-time
    affine folding is actually exercised (init stats are the identity)."""
    variables = model.init(jax.random.PRNGKey(0), left, right)
    flat, treedef = jax.tree_util.tree_flatten_with_path(
        variables["batch_stats"])
    new = []
    for path, leaf in flat:
        is_var = any(getattr(p, "key", None) == "var" for p in path)
        if is_var:
            new.append(jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape),
                                   leaf.dtype))
        else:
            new.append(jnp.asarray(rng.normal(0.0, 0.05, leaf.shape),
                                   leaf.dtype))
    return {"params": variables["params"],
            "batch_stats": jax.tree_util.tree_unflatten(treedef, new)}


@pytest.fixture(scope="module",
                params=["float32-layers", "float32-rows",
                        "bfloat16-layers", "bfloat16-rows",
                        "float32-rows-mxu", "bfloat16-rows-mxu",
                        "float32-rows-chain", "bfloat16-rows-chain"])
def stage4_pair(request):
    """(xla_outputs, pallas_outputs) for one (dtype, kernel-mode) combo.
    The -mxu variants run the rows pipeline with every dw-sep layer as a
    composed rank-1 dense MXU matmul (refine_pallas._compose_dwsep)."""
    parts = request.param.split("-")
    dtype, mode = parts[0], parts[1]
    dw = parts[2] if len(parts) > 2 else "vpu"
    cfg = ModelConfig(compute_dtype=dtype, pallas_mode=mode, rows_dw=dw)
    model = LWSNet(cfg)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    variables = _jittered_variables(model, left, right, rng)
    xla = model.apply(variables, left, right, train=False, num_stages=4)
    fn = make_forward(model, num_stages=4, use_pallas=True, interpret=True)
    pallas = fn(variables, left, right)
    return dtype, xla, pallas


def test_stage4_parity(stage4_pair):
    dtype, xla, pallas = stage4_pair
    assert len(pallas) == 4
    # Every stage must track the XLA oracle. Stage 1 runs the fused Pallas
    # cost-filter kernel (different reduction order than the XLA conv), so
    # stages 1-3 carry small op-order/rounding deviations too.
    for stage, (a, b) in enumerate(zip(xla, pallas)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        span = a.max() - a.min() + 1.0
        if dtype == "float32":
            # f32 end to end (HIGHEST-precision dots): op-order rounding only.
            assert np.abs(a - b).max() < 1e-3 * span, stage
        else:
            # bf16: both paths round differently per-op; bound mean deviation.
            assert np.abs(a - b).mean() < 0.02 * span, stage


def _planar(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def _unplanar(x):
    return jnp.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("chunk", [16, 48])
def test_fused_dwsep_parity(rng, chunk):
    """Per-layer kernel vs the jnp oracle: BN-affine + ReLU + depthwise
    dilated 3x3 + pointwise 1x1, across chunk sizes (grid geometries)."""
    C, Co, d = 8, 16, 4
    x = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.5, (C,)), jnp.float32)
    dwk = jnp.asarray(rng.standard_normal((3, 3, 1, C)), jnp.float32)
    pwk = jnp.asarray(rng.standard_normal((Co, C)), jnp.float32)

    act = jnp.maximum(x * a + b, 0)
    dw = blocks.dw_conv_shift_add(act, dwk, d)
    want = jnp.einsum("bhwc,oc->bhwo", dw, pwk)

    xc = K.layer_canvas(_planar(x), chunk)
    out = K.fused_dwsep(xc, jnp.stack([a, b]), dwk, pwk, dilation=d,
                        chunk=chunk, h_real=H, w_real=W, interpret=True)
    got = _unplanar(K.layer_uncanvas(out, chunk, H, W))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_dwsep2_parity(rng):
    """Pair-fused kernel == two single-layer kernels (the intermediate
    stays in VMEM but the math is identical)."""
    C, d1, d2, chunk = 8, 2, 4, 16
    x = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    args = []
    for _ in range(2):
        a = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.5, (C,)), jnp.float32)
        dwk = jnp.asarray(rng.standard_normal((3, 3, 1, C)), jnp.float32)
        pwk = jnp.asarray(rng.standard_normal((C, C)), jnp.float32)
        args.append((jnp.stack([a, b]), dwk, pwk))

    xc = K.layer_canvas(_planar(x), chunk)
    y1 = K.fused_dwsep(xc, *args[0], dilation=d1, chunk=chunk, h_real=H,
                       w_real=W, interpret=True)
    y1 = K.fused_dwsep(y1, *args[1], dilation=d2, chunk=chunk, h_real=H,
                       w_real=W, interpret=True)
    want = _unplanar(K.layer_uncanvas(y1, chunk, H, W))

    y2 = K.fused_dwsep2(xc, *args[0], *args[1], dilation1=d1, dilation2=d2,
                        chunk=chunk, h_real=H, w_real=W, interpret=True)
    got = _unplanar(K.layer_uncanvas(y2, chunk, H, W))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("d1,d2", [(2, 4), (8, 16), (8, 4), (2, 1)])
def test_rows_dwsep2_and_groups_parity(rng, d1, d2):
    """Pair-fused row-canvas kernel with 2 weight groups == the solo
    dwsep_layer run per batch entry with that entry's weights (the
    intermediate staying in VMEM and the grid-blocked weight selection must
    not change the math)."""
    from lwsnet_tpu.ops.pallas import refine_rows as R

    C, Cm, Co = 8, 8, 8
    H2, W2 = 40, 96
    S, NR = R.canvas_geom(H2, W2, unit=R.PAIR_UNIT)

    x = jnp.asarray(rng.standard_normal((2, H2, W2, C)), jnp.float32)
    G = []
    for _ in range(2):  # one weight set per group
        aff1 = jnp.asarray(np.stack([rng.uniform(0.5, 1.5, C),
                                     rng.normal(0, 0.5, C)]), jnp.float32)
        dwk1 = jnp.asarray(rng.standard_normal((3, 3, 1, C)), jnp.float32)
        pwk1 = jnp.asarray(rng.standard_normal((Cm, C)), jnp.float32)
        aff2 = jnp.asarray(np.stack([rng.uniform(0.5, 1.5, Cm),
                                     rng.normal(0, 0.5, Cm)]), jnp.float32)
        dwk2 = jnp.asarray(rng.standard_normal((3, 3, 1, Cm)), jnp.float32)
        pwk2 = jnp.asarray(rng.standard_normal((Co, Cm)), jnp.float32)
        G.append((aff1, dwk1, pwk1, aff2, dwk2, pwk2))

    xc = R.to_canvas(x, S, NR, jnp.float32)

    # oracle: solo kernels, one batch entry + its own weights at a time
    want = []
    for b in range(2):
        a1, k1, p1, a2, k2, p2 = G[b]
        y = R.dwsep_layer(xc[b:b + 1], a1, k1, p1, dilation=d1, S=S, NR=NR,
                          interpret=True)
        y = R.dwsep_layer(y, a2, k2, p2, dilation=d2, S=S, NR=NR,
                          interpret=True)
        want.append(R.from_canvas(y, H2, W2, S, NR, Co))
    want = jnp.concatenate(want, axis=0)

    stacked = [jnp.stack([G[0][i], G[1][i]]) for i in range(6)]
    got = R.dwsep2_layer(xc, *stacked, dilation1=d1, dilation2=d2,
                         S=S, NR=NR, groups=2, interpret=True)
    got = R.from_canvas(got, H2, W2, S, NR, Co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("ci,co,affine", [
    (3, 32, False),   # im2col tap-stack branch (entry conv shape)
    (32, 16, True),   # per-tap matmul branch
    (32, 1, True),    # VPU Co==1 branch (output conv shape)
])
def test_fused_dense_parity(rng, ci, co, affine):
    d, chunk = 2, 16
    x = jnp.asarray(rng.standard_normal((1, H, W, ci)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
    if affine:
        a = jnp.asarray(rng.uniform(0.5, 1.5, (ci,)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.5, (ci,)), jnp.float32)
        act = jnp.maximum(x * a + b, 0)
        aff = jnp.stack([a, b])
    else:
        act, aff = x, None
    want = blocks.conv3x3_shift_mm(act, kern, dilation=d)

    xc = K.layer_canvas(_planar(x), chunk)
    out = K.fused_dense(xc, kern, dilation=d, chunk=chunk, h_real=H,
                        w_real=W, affine=aff, interpret=True)
    got = _unplanar(K.layer_uncanvas(out, chunk, H, W))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
