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


def _round8(n):
    return -(-n // 8) * 8


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


def _chain_canvas(x, chunk):
    """Pad planar (B, C, H, W) to the layer canvas: top pad = one chunk,
    bottom pad fills to (ceil(H/chunk) + 2) * chunk rows, width lane-aligned."""
    B, C, H, W = x.shape
    Wc = -(-W // 128) * 128
    n_real = -(-H // chunk)
    Hc = (n_real + 2) * chunk
    return jnp.pad(x, ((0, 0), (0, 0), (chunk, Hc - chunk - H),
                       (0, Wc - W))), Hc, Wc
