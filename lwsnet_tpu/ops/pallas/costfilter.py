"""Fused Pallas kernel: 3D-CNN cost filtering + identity skip + soft-argmin.

The reference filters each cost volume with a 6-layer BN+ReLU+Conv3D stack,
adds the input volume back, and regresses disparity as the expectation under
softmax(-cost) (reference: models/submodules.py:190-221 wired at
models/models.py:136-156). In XLA that is 6 HBM round trips of the volume
plus separate softmax/expectation ops; this kernel runs the whole chain in
ONE Pallas call with the volume VMEM-resident end to end.

Layout ("flat-HW"): the (B, H, W, D) volume becomes (B, D+2, Lt) — disparity
slices on the sublane axis (one zero pad slice each end), and the (H, W)
plane flattened onto the lane axis as H+2 row blocks of stride S = W+2 with
one zero "gap" column between rows. Pixel (h, w) lives at lane
ML + (h+1)*S + (w+1). The 27 conv taps then decompose as: depth = sublane
offset (a contiguous 3-sublane dynamic read), and the 9 (dy, dx) spatial
taps = static lane shifts (dy-1)*S + (dx-1) — the gap columns provide the
conv's zero padding in W, the empty first/last row blocks provide it in H,
and the pad slices provide it in D. Lane padding waste is ~2/W (vs 66% for
a 128-aligned W=154 2-D layout).

Per output slice d, the 27 taps are K-stacked into one (27*Ci + 1, Lc)
operand (the +1 is a ones row carrying the folded BN bias) and hit the MXU
as a single (Co, 27*Ci + 1) matmul. BN of layer k+1 folds into layer k's
weights: scale multiplies output rows, bias rides the ones column — so the
only VPU work per layer is ReLU + the pixel mask.

All math matches the XLA `CostFilter3D` path in eval mode: bf16 activations,
f32 matmul accumulation, per-layer bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN_EPS = 1e-5


def _round128(n: int) -> int:
    return -(-n // 128) * 128


def _geom(H: int, W: int):
    """(row stride, left margin, core lanes, total lanes) of the flat-HW
    layout. Margins cover the largest tap shift S+1 on both sides."""
    S = W + 2
    ML = _round128(S + 1)
    Lc = _round128(S * (H + 2))
    return S, ML, Lc, ML + Lc + ML


def _pack(vol: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, D) -> (B, D+2, Lt) flat-HW, zeros in all pad positions."""
    B, H, W, D = vol.shape
    S, ML, Lc, Lt = _geom(H, W)
    x = jnp.transpose(vol, (0, 3, 1, 2))  # (B, D, H, W)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))
    x = x.reshape(B, D + 2, (H + 2) * S)
    return jnp.pad(x, ((0, 0), (0, 0), (ML, Lt - ML - (H + 2) * S)))


def _unpack(flat: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, 1, Lt) -> (B, H, W, 1)."""
    B = flat.shape[0]
    S, ML, _, _ = _geom(H, W)
    x = flat[:, 0, ML:ML + (H + 2) * S].reshape(B, H + 2, S)
    return x[:, 1:H + 1, 1:W + 1, None]


@functools.lru_cache(maxsize=16)
def _pixel_mask(H: int, W: int):
    """(1, 1, Lt) numpy {0,1} mask of real-pixel lanes."""
    S, ML, _, Lt = _geom(H, W)
    m = np.zeros((H + 2, S), np.float32)
    m[1:H + 1, 1:W + 1] = 1.0
    flat = np.zeros((1, 1, Lt), np.float32)
    flat[0, 0, ML:ML + (H + 2) * S] = m.reshape(-1)
    return flat


def _dpad_mask(D: int, dtype) -> jnp.ndarray:
    """(1, D+2, 1) mask zeroing the disparity pad slices. The layer-0
    activation relu(a0*0 + b0) is nonzero at pad positions whenever b0 > 0;
    the flat pixel mask only covers H/W pads, so the D pads need their own."""
    m = jnp.ones((1, D + 2, 1), dtype)
    return m.at[:, 0].set(0).at[:, D + 1].set(0)


def _fold_bn(bn_params, bn_stats):
    """(scale', shift') f32 pair folding inference BatchNorm."""
    a = bn_params["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bn_stats["var"].astype(jnp.float32) + _BN_EPS)
    b = bn_params["bias"].astype(jnp.float32) - \
        bn_stats["mean"].astype(jnp.float32) * a
    return a, b


def _aug_weights(params, stats, n_layers, dtype):
    """Per-layer augmented matmul weights (Co, 27*Ci + 1) from a
    `CostFilter3D` subtree (modules BNReLUConv3D_0..n-1, kernels DHWIO
    (3, 3, 3, Ci, Co), lwsnet_tpu.models.blocks).

    Layer k's weight rows absorb layer k+1's folded BN scale; the last
    column carries layer k+1's folded BN bias (applied to a ones row).
    Layer 0's own BN affine is NOT included — the caller activates the raw
    volume (relu(a0*v + b0)) before the kernel. Returns (weights, (a0, b0)).
    """
    affs = []
    for i in range(n_layers):
        blk = params[f"BNReLUConv3D_{i}"]["BatchNorm_0"]
        bst = stats[f"BNReLUConv3D_{i}"]["BatchNorm_0"]
        affs.append(_fold_bn(blk, bst))

    weights = []
    for i in range(n_layers):
        k = params[f"BNReLUConv3D_{i}"]["kernel"].astype(jnp.float32)
        co, ci = k.shape[4], k.shape[3]
        # (kd, kh, kw, ci, co) -> rows co, cols (kd, kh, kw, ci)
        w = jnp.transpose(k, (4, 0, 1, 2, 3)).reshape(co, 27 * ci)
        if i + 1 < n_layers:
            a_next, b_next = affs[i + 1]
            w = w * a_next[:, None]
            bias = b_next[:, None]
        else:
            bias = jnp.zeros((co, 1), jnp.float32)
        weights.append(jnp.concatenate([w, bias], axis=1).astype(dtype))
    return weights, affs[0]


def _kernel(act0_ref, v_ref, mask_ref, *rest, D, Ci_list, Co_list, S, ML, Lc,
            start):
    """rest = n_layers weight refs, o_ref, bufA, bufB (scratch)."""
    n = len(Ci_list)
    w_refs, o_ref, bufA, bufB = rest[:n], rest[n], rest[n + 1], rest[n + 2]
    mask = mask_ref[0]  # (1, Lt)
    mask_c = mask[:, ML:ML + Lc]  # (1, Lc), aligned with matmul outputs
    offs = [(dy - 1) * S + (dx - 1) for dy in range(3) for dx in range(3)]

    bufA[:] = jnp.zeros(bufA.shape, bufA.dtype)
    bufB[:] = jnp.zeros(bufB.shape, bufB.dtype)

    bufs = [bufA, bufB]
    for k in range(n):
        ci, co = Ci_list[k], Co_list[k]
        src = act0_ref if k == 0 else bufs[(k + 1) % 2]
        dst = bufs[k % 2]
        last = k == n - 1

        def body(d, _, src=src, dst=dst, w_ref=w_refs[k], ci=ci, co=co,
                 last=last):
            block = src[:, pl.ds(d, 3), :]  # (Csrc, 3, Lt): slices d-1..d+1
            taps = [block[:ci, dz, ML + off:ML + off + Lc]
                    for dz in range(3) for off in offs]
            stack = jnp.concatenate(
                taps + [jnp.ones((1, Lc), block.dtype)], axis=0)
            y = jax.lax.dot_general(
                w_ref[:], stack, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if stack.dtype == jnp.float32 else None))
            if not last:
                y = jnp.maximum(y, 0) * mask_c
            dst[0:co, pl.ds(d + 1, 1), ML:ML + Lc] = (
                y.astype(dst.dtype).reshape(co, 1, Lc))
            return 0

        jax.lax.fori_loop(0, D, body, 0, unroll=False)

    # identity skip + soft-argmin over the D valid slices
    final = bufs[(n - 1) % 2]
    cost = (final[0, 1:D + 1, :] + v_ref[0, 1:D + 1, :]).astype(jnp.float32)
    m = jnp.min(cost, axis=0, keepdims=True)
    e = jnp.exp(m - cost) * mask  # softmax(-cost) numerator, pixels only
    den = jnp.sum(e, axis=0, keepdims=True)
    # Mosaic iota must be integer-typed; cast to f32 for the expectation.
    bins = (jax.lax.broadcasted_iota(jnp.int32, e.shape, 0).astype(jnp.float32)
            + jnp.float32(start))
    num = jnp.sum(e * bins, axis=0, keepdims=True)
    o_ref[0] = num / (den + jnp.float32(1e-20))


def _banded_weights(params, stats, n_layers, D, dtype):
    """Folded-D augmented weights for `_folded_kernel`: per layer a
    (9, (D+2)*Co, (D+2)*Ci + 1) stack — one (out-rows, in-rows) matrix per
    (dy, dx) tap, the depth taps realized as a block band over the folded
    D axis (out slice do reads in slices do-1..do+1; pad slices carry zero
    rows/columns). The extra input column pairs with the buffer's ones row:
    the CENTER tap's column holds layer k+1's folded BN bias, and all taps'
    rows absorb its scale — same augmentation scheme as `_aug_weights`."""
    affs = []
    for i in range(n_layers):
        blk = params[f"BNReLUConv3D_{i}"]["BatchNorm_0"]
        bst = stats[f"BNReLUConv3D_{i}"]["BatchNorm_0"]
        affs.append(_fold_bn(blk, bst))

    # Constant placement matrices (jit-safe: weights may be tracers, so the
    # banded structure is expressed as kron with numpy constants).
    # band[kd][do+1, do+kd] = 1: output slice do reads input slice do+kd-1
    # (padded coords), pad output slices get all-zero rows.
    band = []
    for kd in range(3):
        b = np.zeros((D + 2, D + 2), np.float32)
        for do in range(D):
            b[do + 1, do + kd] = 1.0
        band.append(jnp.asarray(b))
    real_rows = np.zeros((D + 2,), np.float32)
    real_rows[1:D + 1] = 1.0
    real_rows = jnp.asarray(real_rows)

    weights = []
    for i in range(n_layers):
        k = params[f"BNReLUConv3D_{i}"]["kernel"].astype(jnp.float32)
        co, ci = k.shape[4], k.shape[3]
        if i + 1 < n_layers:
            a_next, b_next = affs[i + 1]
        else:
            a_next = jnp.ones((co,), jnp.float32)
            b_next = jnp.zeros((co,), jnp.float32)
        taps = []
        for dy in range(3):
            for dx in range(3):
                w_t = sum(jnp.kron(band[kd],
                                   a_next[:, None] * k[kd, dy, dx].T)
                          for kd in range(3))  # ((D+2)*co, (D+2)*ci)
                if dy == 1 and dx == 1:
                    bias = jnp.kron(real_rows, b_next)[:, None]
                else:
                    bias = jnp.zeros(((D + 2) * co, 1), jnp.float32)
                taps.append(jnp.concatenate([w_t, bias], axis=1))
        weights.append(jnp.stack(taps).astype(dtype))
    return weights, affs[0]


def _folded_kernel(act0_ref, v_ref, mask_ref, *rest, D, Co_list, S, ML, Lc,
                   start):
    """Folded-D variant: D rides the matmul row axis (requires
    (D+2)*max(C) + 1 rows); each layer is 9 tap matmuls with f32
    accumulation, no in-kernel loop over disparity slices."""
    n = len(Co_list)
    w_refs, o_ref, bufA, bufB = rest[:n], rest[n], rest[n + 1], rest[n + 2]
    mask = mask_ref[0]  # (1, Lt)
    mask_c = mask[:, ML:ML + Lc]
    offs = [(dy - 1) * S + (dx - 1) for dy in range(3) for dx in range(3)]

    # Scratch lanes outside [ML, ML+Lc) and rows above a layer's row count
    # are read by later taps/layers: keep them zero.
    bufA[:] = jnp.zeros(bufA.shape, bufA.dtype)
    bufB[:] = jnp.zeros(bufB.shape, bufB.dtype)

    bufs = [bufA, bufB]
    src = act0_ref[0]  # (rows0, Lt) value: activated volume + ones row
    cost = None
    for k in range(n):
        co = Co_list[k]
        ro = (D + 2) * co
        dst = bufs[k % 2]
        acc = None
        for t, off in enumerate(offs):
            sl = src[:, ML + off:ML + off + Lc]
            term = jax.lax.dot_general(
                w_refs[k][t], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if sl.dtype == jnp.float32 else None))
            acc = term if acc is None else acc + term
        if k == n - 1:
            cost = acc  # ((D+2)*1, Lc) raw f32
            break
        y = jnp.maximum(acc, 0) * mask_c
        dst[0:ro, ML:ML + Lc] = y.astype(dst.dtype)
        dst[dst.shape[0] - 1, :] = mask[0]  # ones row (bias carrier)
        src = dst[:, :]

    # skip + soft-argmin over the D valid slices
    cost = cost[1:D + 1] + v_ref[0, 1:D + 1, ML:ML + Lc].astype(jnp.float32)
    m = jnp.min(cost, axis=0, keepdims=True)
    e = jnp.exp(m - cost) * mask_c
    den = jnp.sum(e, axis=0, keepdims=True)
    bins = (jax.lax.broadcasted_iota(jnp.int32, e.shape, 0)
            .astype(jnp.float32) + jnp.float32(start))
    num = jnp.sum(e * bins, axis=0, keepdims=True)
    o_ref[0] = jnp.zeros(o_ref.shape[1:], jnp.float32)
    o_ref[0, :, ML:ML + Lc] = num / (den + jnp.float32(1e-20))


def filter_soft_argmin(cost: jnp.ndarray, params, stats, *, layers: int,
                       channels: int, start: int, dtype=jnp.bfloat16,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused CostFilter3D (+identity skip) + soft-argmin, inference mode.

    Equals, in eval mode:
        filt = CostFilter3D(layers, channels).apply(subtree, cost)
        soft_argmin(filt + cost, start, start + D)
    (reference: models/models.py:136-156; oracle `lwsnet_tpu.ops.stereo`).

    Args:
      cost: (B, H, W, D) cost volume.
      params/stats: the `CostFilter3D_k` subtrees of the LWSNet variables.
      layers: mid-layer count (cfg.layers_3d; total convs = layers + 2).
      channels: mid-layer width (cfg.channels_3d * growth_rate[scale]).
      start: first disparity bin (0 for stage 1, -D//2... stages 2-3 pass
        -max_disp+1 per reference models/models.py:151).
    Returns:
      (B, H, W, 1) float32 expected disparity in bin units.

    When (D+2)*channels > 128 (stage-1 shapes) the folded-D formulation's
    banded weights would not fit VMEM, so the call routes to the per-slice
    `_kernel`, whose dynamic 3-sublane read Mosaic only compiles in
    INTERPRET mode — on real TPU that shape must use the XLA CostFilter3D
    path instead (that is what `lwsnet_tpu.inference.make_forward` does).
    A UserWarning fires for other callers who would hit the Mosaic error.
    """
    B, H, W, D = cost.shape
    S, ML, Lc, Lt = _geom(H, W)
    n = layers + 2
    Ci_list = [1] + [channels] * (layers + 1)
    Co_list = [channels] * (layers + 1) + [1]
    cmax = max(Co_list)

    if (D + 2) * cmax <= 128:
        # Folded-D formulation: D rides the matmul rows — full-width MXU
        # tiles for the small-channel stages 2-3 (D=9, C=8 -> 88 rows) and
        # no in-kernel disparity loop.
        return _folded_call(cost, params, stats, n=n, Co_list=Co_list,
                            cmax=cmax, start=start, dtype=dtype,
                            interpret=interpret)

    if not interpret:
        import warnings
        warnings.warn(
            f"filter_soft_argmin: (D+2)*channels = {(D + 2) * cmax} > 128 "
            "routes to the per-slice kernel, which does not compile on real "
            "TPU (unaligned dynamic sublane read); use the XLA CostFilter3D "
            "path for this shape", UserWarning, stacklevel=2)
    weights, (a0, b0) = _aug_weights(params, stats, n, dtype)
    v = _pack(cost.astype(dtype))
    mask = jnp.asarray(_pixel_mask(H, W), dtype)
    act0 = (jnp.maximum(v * a0[0] + b0[0], 0) * mask[0]
            * _dpad_mask(D, v.dtype)).astype(dtype)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_specs = dict(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, D + 2, Lt), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D + 2, Lt), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lt), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [vm] * n,
        out_specs=pl.BlockSpec((1, 1, Lt), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cmax, D + 2, Lt), jnp.dtype(dtype)),
            pltpu.VMEM((cmax, D + 2, Lt), jnp.dtype(dtype)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, D=D, Ci_list=tuple(Ci_list),
                          Co_list=tuple(Co_list), S=S, ML=ML, Lc=Lc,
                          start=start),
        out_shape=jax.ShapeDtypeStruct((B, 1, Lt), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
        **grid_specs,
    )(act0, v, mask, *weights)
    return _unpack(out, H, W)


def _folded_call(cost, params, stats, *, n, Co_list, cmax, start, dtype,
                 interpret):
    """pallas_call plumbing for `_folded_kernel` (see `filter_soft_argmin`)."""
    B, H, W, D = cost.shape
    S, ML, Lc, Lt = _geom(H, W)
    rows = (D + 2) * cmax + 1

    weights, (a0, b0) = _banded_weights(params, stats, n, D, dtype)
    v = _pack(cost.astype(dtype))  # (B, D+2, Lt)
    mask = jnp.asarray(_pixel_mask(H, W), dtype)
    act0 = (jnp.maximum(v * a0[0] + b0[0], 0) * mask[0]
            * _dpad_mask(D, v.dtype)).astype(dtype)
    ones_row = jnp.broadcast_to(mask, (B, 1, Lt))
    act0 = jnp.concatenate([act0, ones_row], axis=1)  # (B, D+3, Lt)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_folded_kernel, D=D, Co_list=tuple(Co_list), S=S,
                          ML=ML, Lc=Lc, start=start),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, D + 3, Lt), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D + 2, Lt), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lt), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [vm] * n,
        out_specs=pl.BlockSpec((1, 1, Lt), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, Lt), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, Lt), jnp.dtype(dtype)),
            pltpu.VMEM((rows, Lt), jnp.dtype(dtype)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(act0, v, mask, *weights)
    return _unpack(out, H, W)
