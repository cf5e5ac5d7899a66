"""Row-canvas Pallas kernels for the stage-4 refinement ("rows" mode).

The refinement is 13 full-resolution layers (two towers of entry-conv + 4
depthwise-separable dilated convs, a 64->32 dense head conv, 4 more dw-sep
convs, and a 3x3->1 output conv; reference: models/submodules.py:282-326).
The planar (B, C, H, W) kernels in `refine.py` unroll every vector op over
the C axis at Mosaic compile time — ~8k vector registers per window — which
is why the "layers" mode costs ~270 s of cold Mosaic compile and the whole-
chain "fused" mode is hour-class. This module reaches the same math with
2-D values only:

* **Canvas**: activations live as (B, C+1, NR*S) — channels (plus one mask
  row) on sublanes, the padded image plane flattened on lanes with row
  stride S = round128(W + 2*MAXD). Because S is a multiple of 128, a
  vertical tap shift of d rows is a lane shift of d*S ≡ 0 (mod 128): the
  three dy taps of a dense conv K-stack into one operand with matching
  vector layouts, and dw-sep windows assemble from whole-row views.
* **Grid**: (batch, row blocks of R(d) rows). The dy reach comes from two
  extra views of the SAME canvas covering d rows above/below the block —
  index maps in d-row block units, so the halo DMA is d rows, not R.
* **Depthwise** taps are 9 VPU multiply-adds of (C, R*S) values against
  lane-pre-broadcast per-channel weights; **pointwise** (and dense) convs
  are MXU matmuls with channels on the contraction axis. BN+ReLU folds
  into the window activation; the mask row zeroes canvas pads so garbage
  never propagates (no pl.when edge cases).

Out-of-image semantics match the reference's padding=dilation quirk
(zeros beyond the image; reference: models/submodules.py:238-280). The XLA
modules (lwsnet_tpu.models.refinement) remain the correctness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAXD = 16  # largest dilation in the reference schedules


def _round128(n: int) -> int:
    return -(-n // 128) * 128


def canvas_geom(H: int, W: int):
    """(row stride S, canvas rows NR). Image pixel (y, x) lives at canvas
    row MAXD + y, lane offset MAXD + x within the row."""
    S = _round128(W + 2 * MAXD)
    NR = 32 * (-(-(H + 2 * MAXD) // 32))  # divisible by every block R
    return S, NR


def _block_rows(d: int) -> int:
    """Row-block height for dilation d: a multiple of 2d (the halo views'
    block unit) that keeps the grid short. 32 rows for every dilation =
    NR/32 grid steps per layer (NR is always a multiple of 32): measured
    faster than the minimal max(8, 2d) blocks, whose 52-step grids at
    d<=4 were dominated by per-step overhead."""
    return max(32, 2 * d)


def to_canvas(x: jnp.ndarray, S: int, NR: int, dtype) -> jnp.ndarray:
    """(B, H, W, C) NHWC -> (B, C+1, NR*S) canvas with trailing mask row."""
    B, H, W, C = x.shape
    x = jnp.transpose(x.astype(dtype), (0, 3, 1, 2))
    ones = jnp.ones((B, 1, H, W), dtype)
    x = jnp.concatenate([x, ones], axis=1)
    x = jnp.pad(x, ((0, 0), (0, 0), (MAXD, NR - MAXD - H),
                    (MAXD, S - MAXD - W)))
    return x.reshape(B, C + 1, NR * S)


def from_canvas(x: jnp.ndarray, H: int, W: int, S: int, NR: int,
                channels: int) -> jnp.ndarray:
    """(B, rows, NR*S) canvas -> (B, H, W, channels) NHWC."""
    B = x.shape[0]
    x = x[:, :channels].reshape(B, channels, NR, S)
    x = x[:, :, MAXD:MAXD + H, MAXD:MAXD + W]
    return jnp.transpose(x, (0, 2, 3, 1))


def _views(rows: int, S: int, NR: int, R: int, d: int):
    """prev (2d rows) / cur (R rows) / next (2d rows) BlockSpecs of one
    canvas. The halo views are 2d rows (not d) because the corner taps'
    slices run d LANES past the d-row dy reach on each side. Clamped edge
    reads feed only outputs on canvas pad rows, which the mask row
    zeroes."""
    q2 = R // (2 * d)  # R = max(8, 2d) keeps this an integer >= 1
    nd2 = NR // (2 * d)

    return [
        pl.BlockSpec((1, rows, 2 * d * S),
                     lambda b, c: (b, 0, jnp.maximum(q2 * c - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, R * S), lambda b, c: (b, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, 2 * d * S),
                     lambda b, c: (b, 0, jnp.minimum(q2 * (c + 1), nd2 - 1)),
                     memory_space=pltpu.VMEM),
    ]


def _window(p_ref, c_ref, n_ref):
    """(rows, (R+4d)*S) window value; all three pieces share lane offset 0
    (block widths are multiples of S, a multiple of 128)."""
    return jnp.concatenate([p_ref[0], c_ref[0], n_ref[0]], axis=1)


def _activate(win, aff_ref, C):
    """BN-affine + ReLU + mask over the window's C data rows. `aff_ref` is
    (2, C, win_width) pre-broadcast along lanes (Mosaic cannot broadcast a
    (C, 1) vector along lanes); the mask row kills canvas pads so the
    affine shift never leaks into them."""
    act = jnp.maximum(win[:C] * aff_ref[0] + aff_ref[1], 0)
    return act * win[C:C + 1]


def _dwsep_kernel(p_ref, c_ref, n_ref, aff_ref, dw_ref, pw_ref, o_ref, *,
                  S, R, d, precision):
    C = pw_ref.shape[1]
    RS = R * S
    win = _activate(_window(p_ref, c_ref, n_ref), aff_ref, C)
    acc = None
    for t, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1)
                                 for dx in (-1, 0, 1)):
        off = 2 * d * S + dy * d * S + dx * d
        term = win[:, off:off + RS] * dw_ref[t]
        acc = term if acc is None else acc + term
    out = jax.lax.dot_general(
        pw_ref[:], acc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    # Mask the OUTPUT too: taps spread nonzero values into canvas pads, and
    # a later activation-free layer (the final conv) must read zeros there —
    # the reference zero-pads every layer's input.
    mask = c_ref[0, C:C + 1]
    o_ref[0, 0:pw_ref.shape[0]] = (out * mask).astype(o_ref.dtype)
    o_ref[0, pw_ref.shape[0]:] = mask.astype(o_ref.dtype)


def _dense_kernel(p_ref, c_ref, n_ref, aff_ref, w_ref, o_ref, *,
                  S, R, d, activate, precision):
    Ci = w_ref.shape[2] // 3
    Co = w_ref.shape[1]
    RS = R * S
    win = _window(p_ref, c_ref, n_ref)
    if activate:
        data = _activate(win, aff_ref, Ci)
    else:
        data = win[:Ci]
    acc = None
    for t, dx in enumerate((-1, 0, 1)):
        # K-stack the three dy taps: their lane shifts are multiples of S,
        # so the slices share a vector layout and concatenate cleanly.
        sl = jnp.concatenate(
            [data[:, 2 * d * S + dy * d * S + dx * d:
                  2 * d * S + dy * d * S + dx * d + RS]
             for dy in (-1, 0, 1)], axis=0)
        term = jax.lax.dot_general(
            w_ref[t], sl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc = term if acc is None else acc + term
    mask = c_ref[0, win.shape[0] - 1:]  # see _dwsep_kernel: pads stay zero
    o_ref[0, 0:Co] = (acc * mask).astype(o_ref.dtype)
    o_ref[0, Co:] = mask.astype(o_ref.dtype)


def _call(kernel, x, consts, *, rows_in, rows_out, S, NR, R, d, out_dtype,
          interpret):
    B = x.shape[0]
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, NR // R),
        in_specs=_views(rows_in, S, NR, R, d) + [vm] * len(consts),
        out_specs=pl.BlockSpec((1, rows_out, R * S), lambda b, c: (b, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows_out, NR * S), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, *consts)


def _precision(dt):
    return jax.lax.Precision.HIGHEST if dt == jnp.float32 else None


def dwsep_layer(x: jnp.ndarray, affine: jnp.ndarray, dwk: jnp.ndarray,
                pwk: jnp.ndarray, *, dilation: int, S: int, NR: int,
                interpret: bool = False) -> jnp.ndarray:
    """Fused BN-affine + ReLU + depthwise dilated 3x3 + pointwise 1x1 on a
    canvas. x: (B, C+1, NR*S); affine: (2, C); dwk: (3, 3, 1, C) HWIO;
    pwk: (Co, C). Returns a (B, Co+1, NR*S) canvas."""
    C, Co = pwk.shape[1], pwk.shape[0]
    d, R = dilation, _block_rows(dilation)
    dt = x.dtype
    width = (R + 4 * d) * S  # window incl. the 2d-row halo views
    aff = jnp.broadcast_to(affine.reshape(2, C, 1), (2, C, width)).astype(dt)
    dwt = jnp.broadcast_to(dwk.reshape(9, C)[:, :, None],
                           (9, C, R * S)).astype(dt)
    return _call(
        functools.partial(_dwsep_kernel, S=S, R=R, d=d,
                          precision=_precision(dt)),
        x, (aff, dwt, pwk.astype(dt)), rows_in=C + 1, rows_out=Co + 1,
        S=S, NR=NR, R=R, d=d, out_dtype=dt, interpret=interpret)


def dense_layer(x: jnp.ndarray, kernel: jnp.ndarray, *, dilation: int,
                S: int, NR: int, affine: jnp.ndarray = None,
                out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """Dense dilated 3x3 conv on a canvas, optionally preceded by folded
    BN-affine + ReLU. x: (B, Ci+1, NR*S); kernel: (3, 3, Ci, Co) HWIO.
    Returns (B, Co+1, NR*S)."""
    _, _, Ci, Co = kernel.shape
    d, R = dilation, _block_rows(dilation)
    dt = x.dtype
    width = (R + 4 * d) * S  # window incl. the 2d-row halo views
    # (3 dx, Co, 3 dy * Ci), dy-major rows to match the kernel's K-stack.
    w = jnp.stack([
        jnp.concatenate([kernel[dy, dx].T for dy in range(3)], axis=1)
        for dx in range(3)]).astype(dt)
    if affine is not None:
        aff = jnp.broadcast_to(affine.reshape(2, Ci, 1),
                               (2, Ci, width)).astype(dt)
    else:
        aff = jnp.zeros((2, 1, 128), dt)  # placeholder, unused
    return _call(
        functools.partial(_dense_kernel, S=S, R=R, d=d,
                          activate=affine is not None,
                          precision=_precision(dt)),
        x, (aff, w), rows_in=Ci + 1, rows_out=Co + 1, S=S, NR=NR, R=R, d=d,
        out_dtype=out_dtype or dt, interpret=interpret)
