"""Fused Pallas kernel: 3D-CNN cost filtering + identity skip + soft-argmin.

The reference filters each cost volume with a 6-layer BN+ReLU+Conv3D stack,
adds the input volume back, and regresses disparity as the expectation under
softmax(-cost) (reference: models/submodules.py:190-221 wired at
models/models.py:136-156). In XLA that is 6 HBM round trips of the volume
plus separate softmax/expectation ops. Here, stages 2-3 run the whole chain
in ONE Pallas call with the volume VMEM-resident end to end (folded-D
kernel); stage-1 shapes (whose (D+2)*C rows outgrow the folded form) run as
per-layer disparity-gridded kernels with full-contraction MXU matmuls
(`_dgrid_call`).

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


def _dgrid_kernel(xm_ref, xc_ref, xp_ref, mask_ref, w_ref, b_ref, o_ref, *,
                  D, S, ML, Lc, relu):
    """One conv3d layer, gridded over (batch, padded disparity slice).

    The three activation refs are halo views of the SAME array at slice
    o-1 / o / o+1 (clamped index maps — the clamped blocks feed only the
    zero-write branch). Every slice/offset below is static, so this lowers
    on real TPU Mosaic for any (D, C) — unlike a dynamic 3-sublane read,
    which must be 8-aligned.

    Per spatial tap (dy, dx), the three DEPTH taps K-stack into one
    (3*Ci, Lc) operand: they share the tap's lane shift, so their vector
    layouts agree (Mosaic refuses to concatenate slices with mismatched
    lane offsets — i.e. different dx shifts — on a non-concat dimension).
    9 accumulated matmuls at contraction depth 3*Ci per output slice."""
    o = pl.program_id(1)
    co, Lt = o_ref.shape[2], o_ref.shape[3]

    @pl.when((o == 0) | (o == D + 1))
    def _pad_slice():
        # D-axis zero padding for the NEXT layer's halo reads.
        o_ref[0, 0] = jnp.zeros((co, Lt), o_ref.dtype)

    @pl.when((o > 0) & (o < D + 1))
    def _real_slice():
        mask_c = mask_ref[0][:, ML:ML + Lc]  # (1, Lc)
        offs = [(dy - 1) * S + (dx - 1)
                for dy in range(3) for dx in range(3)]
        blocks = [xm_ref[0, 0], xc_ref[0, 0], xp_ref[0, 0]]  # (Ci, Lt) each
        acc = None
        for t, off in enumerate(offs):
            sl = jnp.concatenate(
                [blk[:, ML + off:ML + off + Lc] for blk in blocks], axis=0)
            term = jax.lax.dot_general(
                w_ref[t], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if sl.dtype == jnp.float32 else None))
            acc = term if acc is None else acc + term
        y = acc + b_ref[:].astype(jnp.float32)  # (co, 1) bias broadcast
        if relu:
            # Gap/margin lanes must stay zero: relu(bias) would otherwise
            # leak into the next layer's shifted taps. The f32 (1, Lc) ->
            # (co, Lc) sublane vector.broadcast is refused by Mosaic
            # ("Invalid input layout"; bf16 is fine), so f32 replicates the
            # mask row with an explicit sublane concatenate instead.
            if mask_c.dtype == jnp.float32 and co > 1:
                mask_c = jnp.concatenate([mask_c] * co, axis=0)
            y = jnp.maximum(y, 0) * mask_c
        o_ref[0, 0, :, 0:ML] = jnp.zeros((co, ML), o_ref.dtype)
        o_ref[0, 0, :, ML:ML + Lc] = y.astype(o_ref.dtype)
        o_ref[0, 0, :, ML + Lc:Lt] = jnp.zeros((co, Lt - ML - Lc),
                                               o_ref.dtype)


def _dgrid_call(cost, params, stats, *, n, Ci_list, Co_list, start, dtype,
                interpret):
    """Stage-1-class shapes ((D+2)*C > 128): one pallas_call per layer,
    gridded over disparity slices; identity skip + soft-argmin in XLA.

    The inter-layer activations round-trip HBM (~13 MB each at stage-1
    size, ~0.15 ms total) — the price for a formulation whose per-block
    program is tiny (seconds-class Mosaic compile) and whose matmuls run
    at full contraction depth."""
    from lwsnet_tpu.ops import stereo

    B, H, W, D = cost.shape
    S, ML, Lc, Lt = _geom(H, W)
    weights, (a0, b0) = _aug_weights(params, stats, n, dtype)
    v = _pack(cost.astype(dtype))  # (B, D+2, Lt)
    mask = jnp.asarray(_pixel_mask(H, W), dtype)  # (1, 1, Lt)
    act = (jnp.maximum(v * a0[0] + b0[0], 0) * mask[0]
           * _dpad_mask(D, v.dtype)).astype(dtype)[:, :, None, :]

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    for k in range(n):
        ci, co = Ci_list[k], Co_list[k]
        last = k == n - 1
        # (Co, 27*Ci + 1) column order (kd, kh, kw, ci) -> per-spatial-tap
        # (9, Co, 3*Ci) depth-stacked weights + separate (Co, 1) bias,
        # matching the kernel's per-tap K-stack.
        w = weights[k]
        wt = jnp.stack([
            jnp.concatenate([w[:, (kd * 9 + t) * ci:(kd * 9 + t + 1) * ci]
                             for kd in range(3)], axis=1)
            for t in range(9)])
        bias = w[:, 27 * ci:]
        act = pl.pallas_call(
            functools.partial(_dgrid_kernel, D=D, S=S, ML=ML, Lc=Lc,
                              relu=not last),
            grid=(B, D + 2),
            in_specs=[
                pl.BlockSpec((1, 1, ci, Lt),
                             lambda b, o: (b, jnp.maximum(o - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ci, Lt), lambda b, o: (b, o, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ci, Lt),
                             lambda b, o: (b, jnp.minimum(o + 1, D + 1), 0,
                                           0),
                             memory_space=pltpu.VMEM),
                vm, vm, vm,
            ],
            out_specs=pl.BlockSpec((1, 1, co, Lt),
                                   lambda b, o: (b, o, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (B, D + 2, co, Lt), jnp.float32 if last else jnp.dtype(dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(act, act, act, mask, wt, bias)

    # Unpack flat-HW -> (B, H, W, D); skip + soft-argmin are cheap XLA ops
    # (the softmax is a lane-local reduction in this layout).
    flat = act[:, 1:D + 1, 0, :]  # (B, D, Lt) f32
    x = flat[:, :, ML:ML + (H + 2) * S].reshape(B, D, H + 2, S)
    filt = jnp.transpose(x[:, :, 1:H + 1, 1:W + 1], (0, 2, 3, 1))
    return stereo.soft_argmin(filt + cost.astype(jnp.float32),
                              start, start + D)


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


def _geom_chunk(H: int, W: int):
    """(row stride, chunk lanes, chunk count) of the chunked flat-HW layout:
    the (H+2)*(W+2) flat plane is tiled into NC lane chunks of CH, with one
    zero chunk of margin each side. CH >= S+1 so a conv tap never reaches
    beyond the adjacent chunk."""
    S = W + 2
    CH = max(1024, _round128(S + 2))
    NC = -(-(S * (H + 2)) // CH)
    return S, CH, NC


def _pack_chunk(vol: jnp.ndarray, CH: int, NC: int) -> jnp.ndarray:
    """(B, H, W, D) -> (B, D+2, (NC+2)*CH) chunked flat-HW, zeros in pads."""
    B, H, W, D = vol.shape
    S = W + 2
    x = jnp.transpose(vol, (0, 3, 1, 2))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))
    x = x.reshape(B, D + 2, (H + 2) * S)
    return jnp.pad(x, ((0, 0), (0, 0),
                       (CH, (NC + 1) * CH - (H + 2) * S)))


@functools.lru_cache(maxsize=16)
def _pixel_mask_chunk(H: int, W: int, CH: int, NC: int):
    """(1, 1, (NC+2)*CH) numpy {0,1} mask of real-pixel lanes."""
    S = W + 2
    m = np.zeros((H + 2, S), np.float32)
    m[1:H + 1, 1:W + 1] = 1.0
    flat = np.zeros((1, 1, (NC + 2) * CH), np.float32)
    flat[0, 0, CH:CH + (H + 2) * S] = m.reshape(-1)
    return flat


def _folded_kernel(xm_ref, xc_ref, xp_ref, w_ref, o_ref, *,
                   NC, S, CH, ro, relu):
    """One folded-D conv layer over one lane chunk.

    D rides the matmul row axis (rows = (D+2)*C, plus a trailing mask row
    that both carries the bias column's multiplicand and supplies the
    gap-lane mask). The three refs are halo views of the same array at
    chunk c-1 / c / c+1; their lane-concat is offset-clean because CH is a
    multiple of 128. 9 tap matmuls with f32 accumulation per chunk."""
    c = pl.program_id(1)
    rows = o_ref.shape[1]  # ro + 1 (mask row)

    @pl.when((c == 0) | (c == NC + 1))
    def _margin():
        o_ref[0] = jnp.zeros((rows, CH), o_ref.dtype)

    @pl.when((c > 0) & (c < NC + 1))
    def _core():
        window = jnp.concatenate(
            [xm_ref[0], xc_ref[0], xp_ref[0]], axis=1)
        offs = [(dy - 1) * S + (dx - 1)
                for dy in range(3) for dx in range(3)]
        acc = None
        for t, off in enumerate(offs):
            sl = window[:, CH + off:2 * CH + off]
            term = jax.lax.dot_general(
                w_ref[t], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if sl.dtype == jnp.float32 else None))
            acc = term if acc is None else acc + term
        mask_c = window[-1:, CH:2 * CH]
        y = jnp.maximum(acc, 0) * mask_c if relu else acc
        o_ref[0, 0:ro] = y.astype(o_ref.dtype)
        o_ref[0, ro:ro + 1] = mask_c.astype(o_ref.dtype)


def _folded_last_kernel(xm_ref, xc_ref, xp_ref, v_ref, w_ref, o_ref, *,
                        NC, S, CH, D, start):
    """Final folded layer + identity skip + soft-argmin, per lane chunk.
    The softmax over D is a row reduction of the (D+2, CH) accumulator —
    no cross-chunk state, so the regression fuses into the same grid."""
    c = pl.program_id(1)

    @pl.when((c == 0) | (c == NC + 1))
    def _margin():
        o_ref[0] = jnp.zeros((1, CH), o_ref.dtype)

    @pl.when((c > 0) & (c < NC + 1))
    def _core():
        window = jnp.concatenate(
            [xm_ref[0], xc_ref[0], xp_ref[0]], axis=1)
        offs = [(dy - 1) * S + (dx - 1)
                for dy in range(3) for dx in range(3)]
        acc = None
        for t, off in enumerate(offs):
            sl = window[:, CH + off:2 * CH + off]
            term = jax.lax.dot_general(
                w_ref[t], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if sl.dtype == jnp.float32 else None))
            acc = term if acc is None else acc + term
        mask_c = window[-1:, CH:2 * CH].astype(jnp.float32)
        cost = acc[1:D + 1] + v_ref[0, 1:D + 1].astype(jnp.float32)
        m = jnp.min(cost, axis=0, keepdims=True)
        e = jnp.exp(m - cost) * mask_c
        den = jnp.sum(e, axis=0, keepdims=True)
        bins = (jax.lax.broadcasted_iota(jnp.int32, e.shape, 0)
                .astype(jnp.float32) + jnp.float32(start))
        num = jnp.sum(e * bins, axis=0, keepdims=True)
        o_ref[0] = num / (den + jnp.float32(1e-20))


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

    Two TPU-compilable formulations, picked by shape:

    * (D+2)*channels <= 128 (stages 2-3): the folded-D whole-volume kernel —
      one pallas_call, volume VMEM-resident end to end, banded weights.
    * larger (stage 1: D=24, C=32): the disparity-gridded per-layer kernels
      (`_dgrid_call`) — activations round-trip HBM between the 6 layers, but
      every slice is static so Mosaic compiles it for real (the previous
      per-slice whole-volume kernel needed an unaligned dynamic sublane read
      and was interpret-only).
    """
    B, H, W, D = cost.shape
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

    return _dgrid_call(cost, params, stats, n=n, Ci_list=Ci_list,
                       Co_list=Co_list, start=start, dtype=dtype,
                       interpret=interpret)


def _folded_call(cost, params, stats, *, n, Co_list, cmax, start, dtype,
                 interpret):
    """Chunked pallas_call plumbing for the folded-D kernels: one call per
    layer, each gridded over (batch, lane chunk), the final layer fusing
    skip + soft-argmin. Per-chunk code size is bounded by CH (seconds-class
    Mosaic compile at any resolution; the previous whole-volume single call
    scaled its vector-register footprint with H*W and took tens of minutes
    at 1/2 res). The 4 identical mid layers share one Mosaic module."""
    B, H, W, D = cost.shape
    S, CH, NC = _geom_chunk(H, W)
    lanes = (NC + 2) * CH

    weights, (a0, b0) = _banded_weights(params, stats, n, D, dtype)
    v = _pack_chunk(cost.astype(dtype), CH, NC)  # (B, D+2, lanes)
    mask = jnp.asarray(_pixel_mask_chunk(H, W, CH, NC), dtype)
    act = (jnp.maximum(v * a0[0] + b0[0], 0) * mask[0]
           * _dpad_mask(D, v.dtype)).astype(dtype)
    mask_row = jnp.broadcast_to(mask, (B, 1, lanes))
    act = jnp.concatenate([act, mask_row], axis=1)  # (B, (D+2)*1+1, lanes)

    def views(rows):
        return [
            pl.BlockSpec((1, rows, CH),
                         lambda b, c: (b, 0, jnp.maximum(c - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, CH), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, CH),
                         lambda b, c: (b, 0, jnp.minimum(c + 1, NC + 1)),
                         memory_space=pltpu.VMEM),
        ]

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    for k in range(n - 1):
        ri, ro = act.shape[1], (D + 2) * Co_list[k]
        act = pl.pallas_call(
            functools.partial(_folded_kernel, NC=NC, S=S, CH=CH, ro=ro,
                              relu=True),
            grid=(B, NC + 2),
            in_specs=views(ri) + [vm],
            out_specs=pl.BlockSpec((1, ro + 1, CH),
                                   lambda b, c: (b, 0, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, ro + 1, lanes),
                                           jnp.dtype(dtype)),
            compiler_params=cparams,
            interpret=interpret,
        )(act, act, act, weights[k])

    out = pl.pallas_call(
        functools.partial(_folded_last_kernel, NC=NC, S=S, CH=CH, D=D,
                          start=start),
        grid=(B, NC + 2),
        in_specs=views(act.shape[1]) + [
            pl.BlockSpec((1, D + 2, CH), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM), vm],
        out_specs=pl.BlockSpec((1, 1, CH), lambda b, c: (b, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, lanes), jnp.float32),
        compiler_params=cparams,
        interpret=interpret,
    )(act, act, act, v, weights[n - 1])

    # Unpack: drop the margin chunk, reshape the flat plane.
    x = out[:, 0, CH:CH + (H + 2) * S].reshape(B, H + 2, S)
    return x[:, 1:H + 1, 1:W + 1, None]
