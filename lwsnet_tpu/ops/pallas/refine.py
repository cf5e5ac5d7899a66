"""Fused Pallas kernels for the full-resolution refinement stage.

Why these exist: stage 4 (reference: models/submodules.py:282-326) is a chain
of BN + ReLU + depthwise-dilated-3x3 + pointwise-1x1 layers over
(368, 1232, 32) activations. In NHWC, XLA pads the 32-channel lane axis to
128, so every one of the ~10 layers pays 4x-inflated HBM round trips;
measured ~14 ms of the 21 ms forward on a v5e. These kernels run the layers
in a *planar* (C, H, W) layout — W on the 128-lane axis, H on sublanes —
row-blocked over the grid with halos streamed through Mosaic's own block
pipeline (three shifted views of the same canvas), so reads, compute, and
writes overlap without hand-written DMA.

Canvas contract: all kernels take/return (B, C, Hc, Wc) planar "canvas"
arrays built by `layer_canvas(x, chunk)`: top pad = one chunk of rows,
height padded to (ceil(H/chunk) + 2) * chunk, columns 128-lane aligned.
Canvas rows/columns outside the real (h_real, w_real) image may hold
GARBAGE: every kernel zero-masks the window it loads against the real-image
bounds, so garbage never propagates — it only ever occupies out-of-image
positions. Crop once at stage exit with `layer_uncanvas`. The 128-aligned
width lets Mosaic merge (C, rows, Wc) -> (C, rows*Wc) as a no-op shape cast
for the pointwise matmuls.

Compile-time note: row chunks are a GRID dimension, not an in-kernel loop —
an unrolled per-chunk loop of 9 lane-unaligned shifts made Mosaic's compile
time explode (>9 min); as a grid the body compiles once. Grid-step overhead
is real (~20 us/step): the per-layer kernels DMA row windows from an
HBM-resident input precisely so the chunk (and thus step count) is limited
by the window buffer, not by a whole-canvas VMEM block.

All kernels implement inference semantics (BatchNorm folded to a per-channel
affine by the caller). Training uses the XLA path in
`lwsnet_tpu.models.blocks` — same math via autodiff.

Numerics: activations stay in the input dtype (bf16 in production); matmuls
accumulate in f32. The depthwise 9-tap accumulation is in the activation
dtype, matching the bf16 rounding regime of the XLA path. f32 activations
promote the matmuls to Precision.HIGHEST (default MXU precision multiplies
f32 operands in bf16 passes), so an f32 run matches the XLA path's accuracy.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 120 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _dot_precision(dt):
    """Matmul precision by activation dtype: the MXU multiplies f32 operands
    in bf16 passes at default precision (~0.12 max abs deviation vs a f64
    oracle at refinement shapes); HIGHEST restores f32-grade accuracy. bf16
    activations keep the default single-pass bf16 regime."""
    return jax.lax.Precision.HIGHEST if dt == jnp.float32 else None


# ---------------------------------------------------------------------------
# Per-layer kernels: ONE Pallas call per refinement layer on a "layer
# canvas" (`layer_canvas`: top pad = one chunk of rows, height padded to
# (ceil(H/chunk) + 2) * chunk, width 128-lane aligned). The grid tiles
# output rows in chunk-row blocks; blocks 0 and nb-1 are pure padding and
# write zeros. Interior block i assembles the halo'd row window
#     [i*chunk - T8, i*chunk + chunk + T8)        T8 = round8(dilation)
# from THREE shifted block views of the same canvas (prev/cur/next row
# blocks) that Mosaic's block pipeline streams and double-buffers — design
# history on v5e at 368x1232, per dw-sep layer: whole-canvas-in-VMEM blocks
# 0.97 ms (VMEM-capped chunk), hand-rolled serial window DMA 0.65 ms
# (latency floor), dynamic-slot double buffering 3.3 ms (dynamic VMEM
# addressing), vs 0.06 ms for a pure Mosaic-pipelined stream — hence this
# formulation. The window is zeroed/activated as a value (out-of-image rows
# and columns become 0 — the conv's zero padding must surround *activated*
# values, reference: models/submodules.py:238-259), then 9 static tap slices
# feed the VPU/MXU.
# ---------------------------------------------------------------------------


def layer_canvas(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """(B, C, H, W) planar -> layer canvas for `fused_dwsep`/`fused_dense`."""
    return _chain_canvas(x, chunk)[0]


def layer_uncanvas(x: jnp.ndarray, chunk: int, h_real: int,
                   w_real: int) -> jnp.ndarray:
    """Crop a layer canvas back to the real (B, C, h_real, w_real) image."""
    return x[:, :, chunk:chunk + h_real, :w_real]


def pick_layer_chunk(h: int, w: int, max_channels: int,
                     dtype_bytes: int = 2,
                     budget: int = 80 * 1024 * 1024) -> int:
    """Largest row chunk whose window buffer + double-buffered output blocks
    fit VMEM. All layers of a chain share one chunk (the canvas geometry is
    chunk-dependent), so size for the widest layer's channel count."""
    wc = -(-w // 128) * 128
    for chunk in (192, 160, 128, 96, 64, 48, 32, 16):
        # 3 input streams x 2 buffering levels + double-buffered output +
        # window value + tap accumulator (f32) + headroom: ~14 block sizes
        # (the 8x estimate OOM'd at 151M/128M for 64ch/chunk 64 on v5e).
        blocks = 14 * max_channels * chunk * wc * dtype_bytes
        if blocks <= 100 * 1024 * 1024:
            return chunk
    raise ValueError("no layer chunk fits VMEM")


def _window_value(prev_ref, cur_ref, nxt_ref, i, chunk, T8, d, h_real,
                  w_real, aff_ref):
    """Assemble block i's activated input window as a VALUE from the three
    Mosaic-pipelined input blocks (rows [i*chunk - T8, i*chunk + chunk + T8)),
    zeroing out-of-image rows/columns and applying BN-affine + ReLU when
    `aff_ref` ((2, C, 1, Wc)) is given; columns get +-d zero margins for the
    dilated taps. Returns (C, chunk + 2*T8, Wc + 2*d)."""
    Wc = cur_ref.shape[3]
    w = jnp.concatenate([prev_ref[0, :, chunk - T8:, :], cur_ref[0],
                         nxt_ref[0, :, :T8, :]], axis=1)
    if aff_ref is not None:
        w = jnp.maximum(w * aff_ref[0] + aff_ref[1], 0)
    R = chunk + 2 * T8
    base = i * chunk - T8  # canvas row of window row 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, Wc), 0) + base
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, Wc), 1)
    mask = (rows >= chunk) & (rows < chunk + h_real) & (cols < w_real)
    w = jnp.where(mask, w, 0).astype(cur_ref.dtype)
    return jnp.pad(w, ((0, 0), (0, 0), (d, d)))


def _taps(w, d, chunk, T8, Wc):
    """The 9 dilated-3x3 tap views of an assembled window, each
    (C, chunk, Wc) aligned to the output block rows."""
    m = T8 - d
    return [w[:, m + dy * d:m + dy * d + chunk,
              d + (dx - 1) * d:d + (dx - 1) * d + Wc]
            for dy in range(3) for dx in range(3)]


def _layer_step(i_refs, o_ref, chunk, T8, d, h_real, w_real, aff_ref,
                compute):
    """Grid-step scaffolding shared by the per-layer kernels: pad blocks
    (first/last) write zeros; interior blocks assemble the activated window
    and run `compute(window)`. All data movement is Mosaic's own block
    pipeline — a manual DMA version of these kernels measured a ~0.2 ms/layer
    latency floor that the pipelined block fetches don't pay."""
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when((i == 0) | (i == nb - 1))
    def _():
        o_ref[:] = jnp.zeros(o_ref.shape, o_ref.dtype)

    @pl.when((i > 0) & (i < nb - 1))
    def _():
        compute(_window_value(*i_refs, i, chunk, T8, d, h_real, w_real,
                              aff_ref))


def _in_specs(C, chunk, Wc, nb):
    """prev/cur/next row-block views of the SAME canvas, clamped at the
    edges (the first/last blocks' outputs are pad, so their windows are
    don't-care; `nb` is the static block count)."""
    def at(off):
        if off < 0:
            return lambda b, i: (b, 0, jnp.maximum(i + off, 0), 0)
        if off > 0:
            return lambda b, i: (b, 0, jnp.minimum(i + off, nb - 1), 0)
        return lambda b, i: (b, 0, i, 0)
    return [pl.BlockSpec((1, C, chunk, Wc), at(off),
                         memory_space=pltpu.VMEM)
            for off in (-1, 0, 1)]


def _dwsep_layer_kernel(p_ref, c_ref, n_ref, aff_ref, dw_ref, pw_ref, o_ref,
                        *, d, chunk, T8, h_real, w_real):
    Wc = o_ref.shape[3]

    def compute(w):
        acc = None
        for t, sl in enumerate(_taps(w, d, chunk, T8, Wc)):
            term = sl * dw_ref[t]
            acc = term if acc is None else acc + term
        C = acc.shape[0]
        out = jax.lax.dot_general(
            pw_ref[:], acc.reshape(C, chunk * Wc), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(acc.dtype))
        o_ref[0] = out.reshape(-1, chunk, Wc).astype(o_ref.dtype)

    _layer_step((p_ref, c_ref, n_ref), o_ref, chunk, T8, d, h_real, w_real,
                aff_ref, compute)


def fused_dwsep(x: jnp.ndarray, affine: jnp.ndarray,
                dwk: jnp.ndarray, pwk: jnp.ndarray, *, dilation: int,
                chunk: int, h_real: int, w_real: int,
                interpret: bool = False) -> jnp.ndarray:
    """Fused BN-affine + ReLU + depthwise 3x3 (dilated) + pointwise 1x1.

    Args:
      x: (B, C, Hc, Wc) layer canvas (see `layer_canvas`, same `chunk`).
      affine: (2, C) folded BN (scale', shift').
      dwk: (3, 3, 1, C) HWIO depthwise taps.
      pwk: (Co, C) pointwise weights.
      h_real, w_real: true image size.
    Returns:
      (B, Co, Hc, Wc) layer canvas.
    """
    B, C, Hc, Wc = x.shape
    Co = pwk.shape[0]
    d = dilation
    T8 = _round8(d)
    assert chunk >= T8 and Hc % chunk == 0, (chunk, T8, Hc)
    # Mosaic cannot broadcast (C,1,1) over both sublanes and lanes; ship the
    # per-channel vectors pre-broadcast along W (sublane-only broadcast left).
    aff = jnp.broadcast_to(affine.reshape(2, C, 1, 1), (2, C, 1, Wc))
    dwt = jnp.broadcast_to(dwk.reshape(9, C)[:, :, None, None], (9, C, 1, Wc))
    return pl.pallas_call(
        functools.partial(_dwsep_layer_kernel, d=d, chunk=chunk, T8=T8,
                          h_real=h_real, w_real=w_real),
        grid=(B, Hc // chunk),
        in_specs=_in_specs(C, chunk, Wc, Hc // chunk) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Co, chunk, Wc), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Co, Hc, Wc), x.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, x, x, aff, dwt, pwk)


def _dwsep2_layer_kernel(p_ref, c_ref, n_ref, aff1_ref, dw1_ref, pw1_ref,
                         aff2_ref, dw2_ref, pw2_ref, o_ref,
                         *, d1, d2, chunk, T8, h_real, w_real):
    """TWO consecutive dw-sep layers in one kernel: the intermediate
    activation lives only in VMEM, halving the chain's HBM round trips.
    Window halo T8 = round8(d1 + d2); layer 1 computes the intermediate for
    rows [T8 - d2, T8 + chunk + d2) only."""
    Wc = o_ref.shape[3]
    i = pl.program_id(1)

    def compute(w):
        # layer 1 -> intermediate rows [T8 - d2, T8 + chunk + d2)
        rows_i = chunk + 2 * d2
        m0 = T8 - d2 - d1
        acc = None
        for t in range(9):
            dy, dx = divmod(t, 3)
            sl = w[:, m0 + dy * d1:m0 + dy * d1 + rows_i,
                   d1 + (dx - 1) * d1:d1 + (dx - 1) * d1 + Wc]
            term = sl * dw1_ref[t]
            acc = term if acc is None else acc + term
        C = acc.shape[0]
        inter = jax.lax.dot_general(
            pw1_ref[:], acc.reshape(C, rows_i * Wc), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(acc.dtype))
        Co1 = inter.shape[0]
        inter = inter.reshape(Co1, rows_i, Wc).astype(w.dtype)

        # activate intermediate (BN2-affine + ReLU, re-mask rows/cols)
        inter = jnp.maximum(inter * aff2_ref[0] + aff2_ref[1], 0)
        base2 = i * chunk - d2  # canvas row of intermediate row 0
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_i, Wc), 0) + base2
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows_i, Wc), 1)
        mask = (rows >= chunk) & (rows < chunk + h_real) & (cols < w_real)
        inter = jnp.where(mask, inter, 0).astype(w.dtype)
        inter = jnp.pad(inter, ((0, 0), (0, 0), (d2, d2)))

        # layer 2 -> output rows [T8, T8 + chunk)
        acc = None
        for t in range(9):
            dy, dx = divmod(t, 3)
            sl = inter[:, dy * d2:dy * d2 + chunk,
                       d2 + (dx - 1) * d2:d2 + (dx - 1) * d2 + Wc]
            term = sl * dw2_ref[t]
            acc = term if acc is None else acc + term
        out = jax.lax.dot_general(
            pw2_ref[:], acc.reshape(Co1, chunk * Wc), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(acc.dtype))
        o_ref[0] = out.reshape(-1, chunk, Wc).astype(o_ref.dtype)

    _layer_step((p_ref, c_ref, n_ref), o_ref, chunk, T8, d1, h_real, w_real,
                aff1_ref, compute)


def fused_dwsep2(x: jnp.ndarray, affine1, dwk1, pwk1, affine2, dwk2, pwk2,
                 *, dilation1: int, dilation2: int, chunk: int, h_real: int,
                 w_real: int, interpret: bool = False) -> jnp.ndarray:
    """Two fused BN+ReLU+depthwise+pointwise layers, one kernel.

    Args as `fused_dwsep`, twice; layer 1 runs at dilation1, layer 2 at
    dilation2. Requires chunk >= round8(dilation1 + dilation2).
    Returns (B, Co2, Hc, Wc) layer canvas.
    """
    B, C, Hc, Wc = x.shape
    Co1, Co2 = pwk1.shape[0], pwk2.shape[0]
    T8 = _round8(dilation1 + dilation2)
    assert chunk >= T8 and Hc % chunk == 0, (chunk, T8, Hc)

    def bcast(a, c):
        return jnp.broadcast_to(a.reshape(2, c, 1, 1), (2, c, 1, Wc))

    def dwt(k, c):
        return jnp.broadcast_to(k.reshape(9, c)[:, :, None, None],
                                (9, c, 1, Wc))

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dwsep2_layer_kernel, d1=dilation1, d2=dilation2,
                          chunk=chunk, T8=T8, h_real=h_real, w_real=w_real),
        grid=(B, Hc // chunk),
        in_specs=_in_specs(C, chunk, Wc, Hc // chunk) + [vm] * 6,
        out_specs=pl.BlockSpec((1, Co2, chunk, Wc), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Co2, Hc, Wc), x.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, x, x, bcast(affine1, C), dwt(dwk1, C), pwk1,
      bcast(affine2, Co1), dwt(dwk2, Co1), pwk2)


def _dense_stack_layer_kernel(p_ref, c_ref, n_ref, aff_ref, kt_ref, o_ref,
                              *, d, chunk, T8, h_real, w_real, has_aff):
    """Dense conv for small Ci: im2col tap-stack + one matmul."""
    Wc = o_ref.shape[3]

    def compute(w):
        stack = jnp.concatenate(_taps(w, d, chunk, T8, Wc), axis=0)
        C9 = stack.shape[0]
        out = jax.lax.dot_general(
            kt_ref[:], stack.reshape(C9, chunk * Wc), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(stack.dtype))
        o_ref[0] = out.reshape(-1, chunk, Wc).astype(o_ref.dtype)

    _layer_step((p_ref, c_ref, n_ref), o_ref, chunk, T8, d, h_real, w_real,
                aff_ref if has_aff else None, compute)


def _dense_acc_layer_kernel(p_ref, c_ref, n_ref, aff_ref, k_ref, o_ref,
                            *, d, chunk, T8, h_real, w_real, has_aff):
    """Dense conv for wide Ci: 9 per-tap matmuls with f32 accumulation."""
    Wc = o_ref.shape[3]

    def compute(w):
        acc = None
        for t, sl in enumerate(_taps(w, d, chunk, T8, Wc)):
            C = sl.shape[0]
            term = jax.lax.dot_general(
                k_ref[t], sl.reshape(C, chunk * Wc), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(sl.dtype))
            acc = term if acc is None else acc + term
        o_ref[0] = acc.reshape(-1, chunk, Wc).astype(o_ref.dtype)

    _layer_step((p_ref, c_ref, n_ref), o_ref, chunk, T8, d, h_real, w_real,
                aff_ref if has_aff else None, compute)


def _dense_vpu_layer_kernel(p_ref, c_ref, n_ref, aff_ref, k_ref, o_ref,
                            *, d, chunk, T8, h_real, w_real, has_aff, cin):
    """Dense conv for Co == 1: 9*Ci scalar FMAs on the VPU (MXU with M=1 is
    ~0.25% utilized)."""
    Wc = o_ref.shape[3]

    def compute(w):
        acc = jnp.zeros((chunk, Wc), jnp.float32)
        for t, sl in enumerate(_taps(w, d, chunk, T8, Wc)):
            for ci in range(cin):
                acc = acc + sl[ci].astype(jnp.float32) * k_ref[ci, t]
        o_ref[0, 0] = acc.astype(o_ref.dtype)

    _layer_step((p_ref, c_ref, n_ref), o_ref, chunk, T8, d, h_real, w_real,
                aff_ref if has_aff else None, compute)


def fused_dense(x: jnp.ndarray, kernel: jnp.ndarray, *, dilation: int,
                chunk: int, h_real: int, w_real: int,
                affine: Optional[jnp.ndarray] = None,
                interpret: bool = False) -> jnp.ndarray:
    """Fused [BN-affine + ReLU +] dense 3x3 (dilated) conv, layer canvas.

    Strategy by shape: Co == 1 -> VPU shift-add; 9*Ci <= 48 -> im2col
    tap-stack + single matmul; else per-tap matmul accumulation.

    Args:
      x: (B, Ci, Hc, Wc) layer canvas (see `layer_canvas`, same `chunk`).
      kernel: (3, 3, Ci, Co) HWIO (cross-correlation).
      affine: optional (2, Ci) folded BN; None = plain conv.
      h_real, w_real: true image size.
    Returns:
      (B, Co, Hc, Wc) layer canvas.
    """
    B, C, Hc, Wc = x.shape
    Co = kernel.shape[-1]
    d = dilation
    T8 = _round8(d)
    assert chunk >= T8 and Hc % chunk == 0, (chunk, T8, Hc)
    has_aff = affine is not None
    aff = (jnp.broadcast_to(affine.reshape(2, C, 1, 1), (2, C, 1, Wc))
           if has_aff
           else jnp.zeros((2, C, 1, Wc), x.dtype))  # placeholder, unused

    kw = dict(d=d, chunk=chunk, T8=T8, h_real=h_real, w_real=w_real,
              has_aff=has_aff)
    if Co == 1:
        body = functools.partial(_dense_vpu_layer_kernel, cin=C, **kw)
        # (Ci, 9) scalar table in SMEM
        kt = jnp.transpose(kernel[..., 0], (2, 0, 1)).reshape(C, 9)
        kt = kt.astype(jnp.float32)
        k_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    elif 9 * C <= 48:
        body = functools.partial(_dense_stack_layer_kernel, **kw)
        # (Co, 9*Ci) with column order (dy, dx, ci) — matches the tap-major
        # concat in the kernel
        kt = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(Co, 9 * C)
        k_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        body = functools.partial(_dense_acc_layer_kernel, **kw)
        kt = jnp.transpose(kernel, (0, 1, 3, 2)).reshape(9, Co, C)
        k_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    return pl.pallas_call(
        body,
        grid=(B, Hc // chunk),
        in_specs=_in_specs(C, chunk, Wc, Hc // chunk) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            k_spec,
        ],
        out_specs=pl.BlockSpec((1, Co, chunk, Wc), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Co, Hc, Wc), x.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, x, x, aff, kt)


# ---------------------------------------------------------------------------
# Streamed chain kernel: a whole stack of dense dilated-3x3 conv layers in
# ONE kernel on the layer-canvas geometry. Motivation (measured, v5e,
# 368x1232): every per-layer kernel pays ~0.5 ms of fixed cost — window
# assembly, activation masking, and streaming the 3 shifted block views —
# regardless of its conv math (a 32->1 output conv costs 0.556 ms, a full
# dw-sep layer 0.62 ms). Chaining L layers per kernel pays that cost once:
# the window is assembled once and every intermediate lives only as a VMEM
# value. Depthwise-separable layers enter the chain COMPOSED into dense
# rank-1 convs (k[dy,dx,ci,co] = dw[dy,dx,ci] * pw[co,ci] — exact because
# no nonlinearity sits between the depthwise and pointwise convs), so all
# tap math runs as per-tap (Co, Ci) x (Ci, rows*Wc) matmuls on the MXU with
# f32 accumulation instead of 9-tap VPU FMA chains.
#
# Row bookkeeping: the kernel's window covers canvas rows
# [i*chunk - T8, i*chunk + chunk + T8), T8 = round8(sum(dilations)). Layer k
# consumes a d_k-row margin from each side; the running offset s_k =
# sum_{j<k} d_j <= T8 keeps every slice static. Out-of-image rows/columns
# are re-zeroed after every activation (the convs' zero padding must
# surround *activated* values), so canvas garbage never propagates.
# ---------------------------------------------------------------------------


def _acc_conv(w, kt_ref, d, m, rows_out, Wc, cp, precision):
    """Dense dilated-3x3 conv on an activated window VALUE via 9 per-tap
    matmuls with f32 accumulation. `w`: (Ci, R, Wc + 2*cp) with column pad
    cp >= d and zeros outside the real image. Output rows correspond to
    window rows [m + d, m + d + rows_out). Returns (Co, rows_out, Wc) f32."""
    acc = None
    for t in range(9):
        dy, dx = divmod(t, 3)
        sl = w[:, m + dy * d:m + dy * d + rows_out,
               cp + (dx - 1) * d:cp + (dx - 1) * d + Wc]
        Ci = sl.shape[0]
        term = jax.lax.dot_general(
            kt_ref[t], sl.reshape(Ci, rows_out * Wc), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc = term if acc is None else acc + term
    return acc.reshape(-1, rows_out, Wc)


def _chain_body(refs, o_ref, *, chunk, T8, dils, has_aff, n_in, h_real,
                w_real, cp, dt):
    """Grid-step body shared by `fused_chain` callables."""
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    Wc = o_ref.shape[3]
    prec = _dot_precision(dt)

    @pl.when((i == 0) | (i == nb - 1))
    def _():
        o_ref[:] = jnp.zeros(o_ref.shape, o_ref.dtype)

    @pl.when((i > 0) & (i < nb - 1))
    def _():
        base = i * chunk - T8  # canvas row of window row 0
        it = iter(refs)
        views = [(next(it), next(it), next(it)) for _ in range(n_in)]
        affs = [[next(it) for _ in range(n_in)] if has_aff[0] else None]
        kts = [[next(it) for _ in range(n_in)]]
        for k in range(1, len(dils)):
            affs.append(next(it) if has_aff[k] else None)
            kts.append(next(it))

        # Layer 0 directly on the (activated, masked) input window(s); a
        # 2-input chain realizes conv(concat(a, b)) as conv_a(a) + conv_b(b).
        d0 = dils[0]
        rows0 = (chunk + 2 * T8) - 2 * d0 if len(dils) > 1 else chunk
        m0 = 0 if len(dils) > 1 else T8 - d0
        u = None
        for j in range(n_in):
            aj = affs[0][j] if affs[0] is not None else None
            w = _window_value(*views[j], i, chunk, T8, cp, h_real, w_real, aj)
            t = _acc_conv(w, kts[0][j], d0, m0, rows0, Wc, cp, prec)
            u = t if u is None else u + t
        s = d0  # window row of the current value's row 0

        for k in range(1, len(dils)):
            d = dils[k]
            # activate + re-mask + column-pad the intermediate
            if affs[k] is not None:
                u = jnp.maximum(u * affs[k][0] + affs[k][1], 0)
            Rk = u.shape[1]
            rows = jax.lax.broadcasted_iota(jnp.int32, (Rk, Wc), 0) + base + s
            cols = jax.lax.broadcasted_iota(jnp.int32, (Rk, Wc), 1)
            mask = (rows >= chunk) & (rows < chunk + h_real) & (cols < w_real)
            v = jnp.pad(jnp.where(mask, u, 0).astype(dt),
                        ((0, 0), (0, 0), (cp, cp)))
            last = k == len(dils) - 1
            rows_out = chunk if last else Rk - 2 * d
            m = (T8 - s - d) if last else 0
            u = _acc_conv(v, kts[k], d, m, rows_out, Wc, cp, prec)
            s += d

        o_ref[0] = u.astype(o_ref.dtype)


def _kt(kernel):
    """(3, 3, Ci, Co) HWIO -> (9, Co, Ci) per-tap matmul weights."""
    return jnp.transpose(kernel, (0, 1, 3, 2)).reshape(
        9, kernel.shape[3], kernel.shape[2])


def compose_dwsep(dwk: jnp.ndarray, pwk: jnp.ndarray) -> jnp.ndarray:
    """Fold depthwise (3, 3, 1, C) + pointwise (Co, C) into one dense
    (3, 3, C, Co) conv: k[dy,dx,ci,co] = dw[dy,dx,ci] * pw[co,ci]. Exact —
    there is no nonlinearity between the two convs. Computed in f32."""
    dw = dwk.reshape(3, 3, -1).astype(jnp.float32)
    pw = pwk.astype(jnp.float32)
    return dw[:, :, :, None] * pw.T[None, None, :, :]


def fused_chain(inputs, kernels, affines, dilations, *, chunk: int,
                h_real: int, w_real: int, interpret: bool = False,
                out_dtype=None) -> jnp.ndarray:
    """A chain of [BN-affine + ReLU +] dense dilated-3x3 conv layers in ONE
    Pallas kernel; intermediates never leave VMEM.

    Args:
      inputs: tuple of 1 or 2 layer canvases (B, Ci, Hc, Wc) built by
        `layer_canvas(x, chunk)`. With 2 inputs, layer 0 computes
        conv_a(x_a) + conv_b(x_b) == conv(concat(x_a, x_b)) (the reference
        head's entry over concatenated towers, models/submodules.py:302-311).
      kernels: list, one per layer; kernels[0] is a tuple (one per input).
        Each (3, 3, Ci, Co) HWIO. Depthwise-separable layers pass
        `compose_dwsep(dwk, pwk)`.
      affines: list, one per layer; affines[0] a tuple per input. Each
        (2, Ci) folded BN or None (no BN+ReLU before that conv).
      dilations: list of per-layer dilations; requires
        chunk >= round8(sum(dilations)).
    Returns:
      (B, Co_last, Hc, Wc) layer canvas.
    """
    n_in = len(inputs)
    assert n_in in (1, 2), n_in
    B, _, Hc, Wc = inputs[0].shape
    dils = tuple(int(d) for d in dilations)
    T8 = _round8(sum(dils))
    assert chunk >= T8 and Hc % chunk == 0, (chunk, T8, Hc)
    cp = max(dils)
    dt = inputs[0].dtype
    Co = kernels[-1].shape[-1] if len(dils) > 1 else kernels[0][0].shape[-1]
    nb = Hc // chunk

    in_specs, args, has_aff = [], [], []
    for x in inputs:
        in_specs += _in_specs(x.shape[1], chunk, Wc, nb)
        args += [x, x, x]
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def bcast_aff(a):
        c = a.shape[1]
        return jnp.broadcast_to(
            a.astype(dt).reshape(2, c, 1, 1), (2, c, 1, Wc))

    aff0, k0 = affines[0], kernels[0]
    aff0 = aff0 if isinstance(aff0, (tuple, list)) else (aff0,) * n_in
    k0 = k0 if isinstance(k0, (tuple, list)) else (k0,)
    has_aff.append(aff0[0] is not None)
    if has_aff[0]:
        for a in aff0:
            args.append(bcast_aff(a))
            in_specs.append(vm)
    for k in k0:
        args.append(_kt(k.astype(dt)))
        in_specs.append(vm)
    for k in range(1, len(dils)):
        has_aff.append(affines[k] is not None)
        if has_aff[-1]:
            args.append(bcast_aff(affines[k]))
            in_specs.append(vm)
        args.append(_kt(kernels[k].astype(dt)))
        in_specs.append(vm)

    def body(*refs):
        _chain_body(refs[:-1], refs[-1], chunk=chunk, T8=T8, dils=dils,
                    has_aff=tuple(has_aff), n_in=n_in, h_real=h_real,
                    w_real=w_real, cp=cp, dt=dt)

    return pl.pallas_call(
        body,
        grid=(B, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Co, chunk, Wc), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Co, Hc, Wc), out_dtype or dt),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Whole-chain kernels: an entire refinement tower (entry conv + 4 dw-sep
# layers) or the refinement head (dense dilated conv + 4 dw-sep layers +
# 1-channel output conv) in ONE kernel. Activations never leave VMEM between
# layers — this removes the ~0.3 ms/layer block-copy machinery and every
# intermediate HBM round trip that per-layer kernels pay.
#
# Geometry. The wrapper pads the planar image to its own "chain canvas":
# rows [chunk, chunk + H) are real (top pad = one full chunk, bottom pad >=
# one chunk), width lane-aligned to Wc. The grid tiles output rows in
# `chunk`-row blocks; blocks 0 and nb-1 are pure padding and just write
# zeros. Interior block i DMAs the row window
#     [i*chunk - T8, i*chunk + chunk + T8)        T8 = sum(dilations)+1,
#                                                 rounded up to 8 (DMA rows
#                                                 stay 8-aligned)
# from the HBM-resident input into a VMEM buffer — chunk >= T8 guarantees
# the window never leaves the canvas, so no clamping and no misalignment.
# Within the window every layer's valid row range is STATIC: layer k's input
# occupies buffer rows [o0 + m_k, R8 - o0 - m_k), o0 = T8 - sum(d) - 1,
# m_{k+1} = m_k + d_k. Image columns sit at [_CPAD, _CPAD + w_real);
# everything outside stays zero (buffers zeroed per step; layers only write
# the real-column span), giving the convs their zero padding for free.
# ---------------------------------------------------------------------------

_CPAD = 128  # in-buffer column margin (>= max dilation; multiple of 128)


def _chain_margins(dilations):
    m = [0]
    for d in dilations:
        m.append(m[-1] + d)
    return m


def _round8(n):
    return -(-n // 8) * 8


def _row_mask(base, m, rows, w_real, pad_top, h_real):
    """Real-image row mask for buffer rows [m, m+rows); `base` is the canvas
    row of buffer row 0, real canvas rows are [pad_top, pad_top + h_real)."""
    g = jax.lax.broadcasted_iota(jnp.int32, (rows, w_real), 0) + (base + m)
    return (g >= pad_top) & (g < pad_top + h_real)


def _apply_bn_relu(buf, aff_ref, k, base, m, rows, w_real, pad_top, h_real):
    """In-place BN-affine + ReLU on buffer rows [m, m+rows), real columns
    only; out-of-image rows forced to zero (the conv's zero padding must
    surround *activated* values, reference: models/submodules.py:238-259).
    aff_ref: (L, 2, C, 1, >=w_real)."""
    v = buf[:, m:m + rows, _CPAD:_CPAD + w_real]
    v = jnp.maximum(v * aff_ref[k, 0, :, :, :w_real]
                    + aff_ref[k, 1, :, :, :w_real], 0)
    mask = _row_mask(base, m, rows, w_real, pad_top, h_real)
    buf[:, m:m + rows, _CPAD:_CPAD + w_real] = jnp.where(
        mask, v, 0).astype(buf.dtype)


def _dwsep_step(src, dst, dw_ref, pw_ref, k, d, m, rows_in, Wc, w_real):
    """One depthwise(dilated d) + pointwise layer: src rows [m, m+rows_in)
    (already activated) -> dst rows [m+d, m+d+rows_in-2d), real columns.
    dw_ref: (L, 9, C, 1, >=Wc); pw_ref: (L, Co, C)."""
    rows_out = rows_in - 2 * d
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = src[:, m + dy * d:m + dy * d + rows_out,
                     _CPAD + (dx - 1) * d:_CPAD + (dx - 1) * d + Wc]
            term = sl * dw_ref[k, dy * 3 + dx]
            acc = term if acc is None else acc + term
    C = acc.shape[0]
    out = jax.lax.dot_general(
        pw_ref[k], acc.reshape(C, rows_out * Wc), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(acc.dtype))
    Co = out.shape[0]
    out = out.reshape(Co, rows_out, Wc).astype(dst.dtype)
    dst[:, m + d:m + d + rows_out, _CPAD:_CPAD + w_real] = out[:, :, :w_real]


def _zero_and_dma(x_ref, buf, sem, b, i, chunk, T8, Wc):
    """Zero `buf`, then DMA the row window [i*chunk - T8, +R8) of batch b's
    HBM canvas into its center columns. Returns the window's canvas base."""
    R8 = buf.shape[1]
    buf[:] = jnp.zeros(buf.shape, buf.dtype)
    # chunk and T8 are multiples of 8; hint it so Mosaic allows the DMA slice
    start = pl.multiple_of(i * chunk - T8, 8)
    dma = pltpu.make_async_copy(
        x_ref.at[b, :, pl.ds(start, R8), :],
        buf.at[:, :, _CPAD:_CPAD + Wc],
        sem)
    dma.start()
    dma.wait()
    return start


def _tower_kernel(x_ref, ek_ref, aff_ref, dw_ref, pw_ref, o_ref,
                  xbuf, a_buf, b_buf, sem,
                  *, chunk, T8, dilations, pad_top, h_real, w_real, cin):
    """Entry 3x3 dense conv (d=1, no BN) + len(dilations) dw-sep layers."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    Wc = o_ref.shape[3]
    R8 = xbuf.shape[1]
    o0 = T8 - (1 + sum(dilations))

    @pl.when((i == 0) | (i == nb - 1))
    def _():
        o_ref[:] = jnp.zeros(o_ref.shape, o_ref.dtype)

    @pl.when((i > 0) & (i < nb - 1))
    def _():
        base = _zero_and_dma(x_ref, xbuf, sem, b, i, chunk, T8, Wc)
        a_buf[:] = jnp.zeros(a_buf.shape, a_buf.dtype)
        b_buf[:] = jnp.zeros(b_buf.shape, b_buf.dtype)

        # mask out-of-image rows of the raw input (no BN on the entry conv,
        # reference: models/submodules.py:284-286)
        v = xbuf[:, :, _CPAD:_CPAD + w_real]
        mask = _row_mask(base, 0, R8, w_real, pad_top, h_real)
        xbuf[:, :, _CPAD:_CPAD + w_real] = jnp.where(
            mask, v, 0).astype(xbuf.dtype)

        # entry conv: im2col stack over 9 taps x cin channels, one matmul
        rows_in = R8 - 2 * o0
        rows_out = rows_in - 2
        taps = [xbuf[:, o0 + dy:o0 + dy + rows_out,
                     _CPAD + (dx - 1):_CPAD + (dx - 1) + Wc]
                for dy in range(3) for dx in range(3)]
        stack = jnp.concatenate(taps, axis=0)  # (9*cin, rows_out, Wc)
        out = jax.lax.dot_general(
            ek_ref[:], stack.reshape(9 * cin, rows_out * Wc),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(stack.dtype))
        F = out.shape[0]
        out = out.reshape(F, rows_out, Wc).astype(a_buf.dtype)
        a_buf[:, o0 + 1:o0 + 1 + rows_out,
              _CPAD:_CPAD + w_real] = out[:, :, :w_real]

        margins = [o0 + 1 + m for m in _chain_margins(dilations)]
        bufs = [a_buf, b_buf]
        for k, d in enumerate(dilations):
            src, dst = bufs[k % 2], bufs[(k + 1) % 2]
            rows_k = R8 - 2 * margins[k]
            _apply_bn_relu(src, aff_ref, k, base, margins[k], rows_k,
                           w_real, pad_top, h_real)
            _dwsep_step(src, dst, dw_ref, pw_ref, k, d, margins[k], rows_k,
                        Wc, w_real)
        final = bufs[len(dilations) % 2]
        o_ref[0] = final[:, T8:T8 + chunk, _CPAD:_CPAD + Wc]


def _chain_canvas(x, chunk):
    """Pad planar (B, C, H, W) to the chain canvas: top pad = one chunk,
    bottom pad fills to (ceil(H/chunk) + 2) * chunk rows, width lane-aligned."""
    B, C, H, W = x.shape
    Wc = -(-W // 128) * 128
    n_real = -(-H // chunk)
    Hc = (n_real + 2) * chunk
    return jnp.pad(x, ((0, 0), (0, 0), (chunk, Hc - chunk - H),
                       (0, Wc - W))), Hc, Wc


def _pick_chain_chunk(total8, *buffer_channels, wc):
    """Largest chunk whose VMEM scratch footprint stays under budget."""
    budget = 72 * 1024 * 1024
    wcp = wc + 2 * _CPAD
    for chunk in (184, 152, 112, 96, 64, 48, 32):
        if chunk < total8:
            continue
        rows = chunk + 2 * total8
        if sum(c * rows * wcp * 2 for c in buffer_channels) <= budget:
            return chunk
    raise ValueError("no chain chunk fits VMEM")


def fused_tower(x: jnp.ndarray, entry_kernel: jnp.ndarray,
                affines: jnp.ndarray, dwks: jnp.ndarray, pwks: jnp.ndarray,
                *, dilations, interpret: bool = False) -> jnp.ndarray:
    """A full refinement tower (reference: models/submodules.py:282-300) in
    one kernel: plain 3x3 conv then L = len(dilations) dw-sep layers each
    preceded by BN-affine + ReLU.

    Args:
      x: (B, Ci, H, W) PLANAR image (Ci = 3 RGB or 1 disparity).
      entry_kernel: (3, 3, Ci, F) HWIO.
      affines: (L, 2, F) folded BN per layer.
      dwks: (L, 3, 3, 1, F) depthwise taps per layer.
      pwks: (L, F, F) pointwise weights per layer.
    Returns:
      (B, F, H, W) planar.
    """
    B, Ci, H, W = x.shape
    L = len(dilations)
    F = pwks.shape[1]
    total = 1 + sum(dilations)
    T8 = _round8(total)
    Wc = -(-W // 128) * 128
    chunk = _pick_chain_chunk(T8, Ci, F, F, wc=Wc)
    xc, Hc, Wc = _chain_canvas(x, chunk)
    R8 = chunk + 2 * T8
    Wcp = Wc + 2 * _CPAD
    dt = x.dtype

    ek = jnp.transpose(entry_kernel, (3, 0, 1, 2)).reshape(F, 9 * Ci)
    aff = jnp.broadcast_to(affines[:, :, :, None, None], (L, 2, F, 1, Wc))
    dwt = jnp.broadcast_to(dwks.reshape(L, 9, F)[:, :, :, None, None],
                           (L, 9, F, 1, Wc))
    out = pl.pallas_call(
        functools.partial(_tower_kernel, chunk=chunk, T8=T8,
                          dilations=tuple(dilations), pad_top=chunk,
                          h_real=H, w_real=W, cin=Ci),
        grid=(B, Hc // chunk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, chunk, Wc), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, Hc, Wc), dt),
        scratch_shapes=[
            pltpu.VMEM((Ci, R8, Wcp), dt),   # entry input window
            pltpu.VMEM((F, R8, Wcp), dt),    # ping
            pltpu.VMEM((F, R8, Wcp), dt),    # pong
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xc, ek, aff, dwt, pwks)
    return out[:, :, chunk:chunk + H, :W]


def _head_kernel(x_ref, aff0_ref, k0_ref, aff_ref, dw_ref, pw_ref, fk_ref,
                 o_ref, xbuf, a_buf, b_buf, sem,
                 *, chunk, T8, d0, dilations, pad_top, h_real, w_real,
                 cin, cmid):
    """BN+ReLU+dense 3x3 (dilation d0) + dw-sep chain + plain 3x3 -> 1."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    Wc = o_ref.shape[3]
    R8 = xbuf.shape[1]
    o0 = T8 - (d0 + sum(dilations) + 1)

    @pl.when((i == 0) | (i == nb - 1))
    def _():
        o_ref[:] = jnp.zeros(o_ref.shape, o_ref.dtype)

    @pl.when((i > 0) & (i < nb - 1))
    def _():
        base = _zero_and_dma(x_ref, xbuf, sem, b, i, chunk, T8, Wc)
        a_buf[:] = jnp.zeros(a_buf.shape, a_buf.dtype)
        b_buf[:] = jnp.zeros(b_buf.shape, b_buf.dtype)

        # BN + ReLU then dense dilated conv (reference:
        # models/submodules.py:302-311) via 9 per-tap matmuls, f32 accum.
        v = xbuf[:, :, _CPAD:_CPAD + w_real]
        v = jnp.maximum(v * aff0_ref[0, :, :, :w_real]
                        + aff0_ref[1, :, :, :w_real], 0)
        mask = _row_mask(base, 0, R8, w_real, pad_top, h_real)
        xbuf[:, :, _CPAD:_CPAD + w_real] = jnp.where(
            mask, v, 0).astype(xbuf.dtype)

        rows_in = R8 - 2 * o0
        rows_out = rows_in - 2 * d0
        acc = None
        for dy in range(3):
            for dx in range(3):
                sl = xbuf[:, o0 + dy * d0:o0 + dy * d0 + rows_out,
                          _CPAD + (dx - 1) * d0:_CPAD + (dx - 1) * d0 + Wc]
                term = jax.lax.dot_general(
                    k0_ref[dy * 3 + dx], sl.reshape(cin, rows_out * Wc),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(sl.dtype))
                acc = term if acc is None else acc + term
        out = acc.reshape(cmid, rows_out, Wc).astype(a_buf.dtype)
        a_buf[:, o0 + d0:o0 + d0 + rows_out,
              _CPAD:_CPAD + w_real] = out[:, :, :w_real]

        margins = [o0 + d0 + m for m in _chain_margins(dilations)]
        bufs = [a_buf, b_buf]
        for k, d in enumerate(dilations):
            src, dst = bufs[k % 2], bufs[(k + 1) % 2]
            rows_k = R8 - 2 * margins[k]
            _apply_bn_relu(src, aff_ref, k, base, margins[k], rows_k,
                           w_real, pad_top, h_real)
            _dwsep_step(src, dst, dw_ref, pw_ref, k, d, margins[k], rows_k,
                        Wc, w_real)
        final = bufs[len(dilations) % 2]

        # plain 3x3 -> 1 output conv on the VPU
        # (reference: models/submodules.py:313-318)
        m = margins[-1]
        # every other conv's input is re-masked by the next activation; the
        # output conv has none, so zero out-of-image rows of `final` here to
        # reproduce the conv's zero padding at the image boundary
        rows_f = R8 - 2 * m
        vf = final[:, m:m + rows_f, _CPAD:_CPAD + w_real]
        mf = _row_mask(base, m, rows_f, w_real, pad_top, h_real)
        final[:, m:m + rows_f, _CPAD:_CPAD + w_real] = jnp.where(
            mf, vf, 0).astype(final.dtype)
        facc = jnp.zeros((chunk, Wc), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = final[:, m + dy:m + dy + chunk,
                           _CPAD + (dx - 1):_CPAD + (dx - 1) + Wc]
                for ci in range(cmid):
                    facc = facc + (sl[ci].astype(jnp.float32)
                                   * fk_ref[ci, dy * 3 + dx])
        o_ref[0, 0] = facc.astype(o_ref.dtype)


def fused_head(x: jnp.ndarray, affine0: jnp.ndarray, dense_kernel: jnp.ndarray,
               affines: jnp.ndarray, dwks: jnp.ndarray, pwks: jnp.ndarray,
               out_kernel: jnp.ndarray, *, dense_dilation: int, dilations,
               interpret: bool = False) -> jnp.ndarray:
    """The refinement head (reference: models/submodules.py:302-326) in one
    kernel: BN+ReLU+dense dilated 3x3 (2F -> F), L dw-sep layers, plain
    3x3 -> 1 output conv.

    Args:
      x: (B, 2F, H, W) PLANAR (concatenated tower outputs).
      affine0: (2, 2F) folded BN for the dense layer's input.
      dense_kernel: (3, 3, 2F, F) HWIO.
      affines: (L, 2, F); dwks: (L, 3, 3, 1, F); pwks: (L, F, F).
      out_kernel: (3, 3, F, 1) HWIO.
    Returns:
      (B, 1, H, W) planar.
    """
    B, C2, H, W = x.shape
    L = len(dilations)
    F = pwks.shape[1]
    total = dense_dilation + sum(dilations) + 1
    T8 = _round8(total)
    Wc = -(-W // 128) * 128
    chunk = _pick_chain_chunk(T8, C2, F, F, wc=Wc)
    xc, Hc, Wc = _chain_canvas(x, chunk)
    R8 = chunk + 2 * T8
    Wcp = Wc + 2 * _CPAD
    dt = x.dtype

    aff0 = jnp.broadcast_to(affine0[:, :, None, None], (2, C2, 1, Wc))
    k0 = jnp.transpose(dense_kernel, (0, 1, 3, 2)).reshape(9, F, C2)
    aff = jnp.broadcast_to(affines[:, :, :, None, None], (L, 2, F, 1, Wc))
    dwt = jnp.broadcast_to(dwks.reshape(L, 9, F)[:, :, :, None, None],
                           (L, 9, F, 1, Wc))
    fk = jnp.transpose(out_kernel[..., 0], (2, 0, 1)).reshape(F, 9)
    fk = fk.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_head_kernel, chunk=chunk, T8=T8, d0=dense_dilation,
                          dilations=tuple(dilations), pad_top=chunk,
                          h_real=H, w_real=W, cin=C2, cmid=F),
        grid=(B, Hc // chunk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, Wc), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, Hc, Wc), dt),
        scratch_shapes=[
            pltpu.VMEM((C2, R8, Wcp), dt),
            pltpu.VMEM((F, R8, Wcp), dt),
            pltpu.VMEM((F, R8, Wcp), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xc, aff0, k0, aff, dwt, pwks, fk)
    return out[:, :, chunk:chunk + H, :W]
