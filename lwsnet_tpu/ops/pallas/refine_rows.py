"""Row-canvas Pallas kernels for the stage-4 refinement ("rows" mode).

The refinement is 13 full-resolution layers (two towers of entry-conv + 4
depthwise-separable dilated convs, a 64->32 dense head conv, 4 more dw-sep
convs, and a 3x3->1 output conv; reference: models/submodules.py:282-326).
The planar (B, C, H, W) kernels in `refine.py` unroll every vector op over
the C axis at Mosaic compile time — ~8k vector registers per window — which
is why the "layers" mode costs ~270 s of cold Mosaic compile. This module
reaches the same math with 2-D values only:

* **Canvas**: activations live as (B, C+1, NR*S) — channels (plus one mask
  row) on sublanes, the padded image plane flattened on lanes with row
  stride S = round128(W + 2*MAXD). Because S is a multiple of 128, a
  vertical tap shift of d rows is a lane shift of d*S ≡ 0 (mod 128): the
  three dy taps of a dense conv K-stack into one operand with matching
  vector layouts, and dw-sep windows assemble from whole-row views.
* **Grid**: (batch, row blocks of R rows). The dy reach comes from two
  extra views of the SAME canvas covering halo rows above/below the block —
  index maps in halo-row block units, so the halo DMA is the halo, not R.
* **Depthwise** taps are 9 VPU multiply-adds of (C, R*S) values against
  lane-pre-broadcast per-channel weights; **pointwise** (and dense) convs
  are MXU matmuls with channels on the contraction axis. BN+ReLU folds
  into the window activation; the mask row zeroes canvas pads so garbage
  never propagates (no pl.when edge cases).
* **Pair fusion** (`dwsep2_layer`): two consecutive dw-sep layers in one
  kernel — the intermediate activation never touches HBM, halving the
  chain's canvas round trips.
* **Weight groups**: every weight operand carries a leading G axis blocked
  on the grid's batch index, so the two refinement towers (different
  weights, identical shapes) run as ONE 2B-batch kernel chain instead of
  two B-batch chains.

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

# Row-block height shared by every layer of the paired pipeline. All the
# dilations (1, 8) and pair sums (2+4, 8+16, 8+4, 2+1) that occur in the
# reference schedules satisfy the divisibility constraints below at R = 48.
PAIR_UNIT = 48

# Ship per-channel weights as (.., C, 1) operands and let the kernels'
# jnp broadcasting replicate them along lanes (Mosaic handles minor-dim
# broadcasts in current jax). The pre-broadcast fallback materializes
# (.., C, width) operands in HBM — tens of MB per layer, which both costs
# bandwidth and overflows VMEM for the pair-fused kernels. Env override
# LWSNET_ROWS_COMPACT=0 restores the fallback if a Mosaic regression ever
# rejects the compact form. NOTE: read ONCE at import — flipping the env
# var after this module is imported (or against a jit-cached forward) has
# no effect; it is a process-level escape hatch, not a runtime knob.
import os as _os

COMPACT_WEIGHTS = _os.environ.get("LWSNET_ROWS_COMPACT", "1") != "0"


def _round128(n: int) -> int:
    return -(-n // 128) * 128


def canvas_geom(H: int, W: int, unit: int = 32):
    """(row stride S, canvas rows NR). Image pixel (y, x) lives at canvas
    row MAXD + y, lane offset MAXD + x within the row. `unit` sets the
    NR granularity: 32 for the solo per-layer pipeline, PAIR_UNIT for the
    pair-fused pipeline (every block height must divide NR)."""
    S = _round128(W + 2 * MAXD)
    NR = unit * (-(-(H + 2 * MAXD) // unit))
    return S, NR


def _block_rows(d: int) -> int:
    """Row-block height for a solo layer of dilation d: a multiple of 2d
    (the halo views' block unit) that keeps the grid short. 32 rows for
    every dilation = NR/32 grid steps per layer (NR is a multiple of 32
    in the solo pipeline): measured faster than the minimal max(8, 2d)
    blocks, whose 52-step grids at d<=4 were dominated by per-step
    overhead."""
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
    zeroes.

    The index maps step in 2d-row block units, so both the row block R and
    the canvas height NR must be multiples of 2d — true for every layer
    and pair of the reference schedules under both pipelines (R = 32/48,
    NR a multiple of 32/PAIR_UNIT); asserted because a new dilation would
    otherwise silently misalign the halo views."""
    assert R % (2 * d) == 0, (R, d)
    assert NR % (2 * d) == 0, (NR, d)
    q2 = R // (2 * d)
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


def _mul_rows(x: jnp.ndarray, row: jnp.ndarray) -> jnp.ndarray:
    """x * row with row (1, L) replicated over x's sublanes. Mosaic
    (current TPU toolchain) refuses the F32 (1, L) -> (n, L)
    vector.broadcast the implicit multiply needs — while handling the same
    broadcast fine for bf16 rows — so f32 rows are replicated with an
    explicit sublane concatenate (exact; the same mechanism as the
    kernels' K-stacks)."""
    n = x.shape[0]
    if row.dtype == jnp.float32 and n > 1:
        row = jnp.concatenate([row] * n, axis=0)
    return x * row


def _activate(win, aff, C):
    """BN-affine + ReLU + mask over the window's C data rows. `aff` is
    (2, C, 1) (lane-broadcast by the multiply) or (2, C, win_width)
    pre-broadcast, per COMPACT_WEIGHTS; the mask row kills canvas pads so
    the affine shift never leaks into them."""
    act = jnp.maximum(win[:C] * aff[0] + aff[1], 0)
    return _mul_rows(act, win[C:C + 1])


def _dwsep_kernel(p_ref, c_ref, n_ref, aff_ref, dw_ref, pw_ref, o_ref, *,
                  S, R, d, precision):
    aff, dw, pw = aff_ref[0], dw_ref[0], pw_ref[0]
    C = pw.shape[1]
    RS = R * S
    win = _activate(_window(p_ref, c_ref, n_ref), aff, C)
    acc = None
    for t, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1)
                                 for dx in (-1, 0, 1)):
        off = 2 * d * S + dy * d * S + dx * d
        term = win[:, off:off + RS] * dw[t]
        acc = term if acc is None else acc + term
    out = jax.lax.dot_general(
        pw, acc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    # Mask the OUTPUT too: taps spread nonzero values into canvas pads, and
    # a later activation-free layer (the final conv) must read zeros there —
    # the reference zero-pads every layer's input.
    mask = c_ref[0, C:C + 1]
    o_ref[0, 0:pw.shape[0]] = _mul_rows(out, mask).astype(o_ref.dtype)
    o_ref[0, pw.shape[0]:] = mask.astype(o_ref.dtype)


def _dwsep2_kernel(p_ref, c_ref, n_ref, a1_ref, dw1_ref, pw1_ref,
                   a2_ref, dw2_ref, pw2_ref, o_ref, *,
                   S, R, D, d1, d2, precision):
    """TWO consecutive dw-sep layers; the intermediate lives only as a VMEM
    value. Views carry a 2D-row halo (D = d1 + d2). The intermediate is
    computed for block rows [-d2-1, R+d2+1) — the extra row each side
    covers the +-d2 LANE overhang of layer 2's corner taps (a lane shift
    crosses into the neighboring canvas row, whose pad columns the mask
    row has zeroed)."""
    a1, dw1, pw1 = a1_ref[0], dw1_ref[0], pw1_ref[0]
    a2, dw2, pw2 = a2_ref[0], dw2_ref[0], pw2_ref[0]
    C, Cm = pw1.shape[1], pw1.shape[0]
    RS = R * S
    ri = R + 2 * d2 + 2          # intermediate rows
    m0 = 2 * D - d2 - 1          # window row of intermediate row 0
    win = _window(p_ref, c_ref, n_ref)            # (C+1, (R+4D)*S)
    act = _activate(win, a1, C)

    acc = None
    for t, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1)
                                 for dx in (-1, 0, 1)):
        off = (m0 + dy * d1) * S + dx * d1
        term = act[:, off:off + ri * S] * dw1[t]
        acc = term if acc is None else acc + term
    inter = jax.lax.dot_general(
        pw1, acc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    # Same op order as the solo pair: the first kernel writes
    # (out * mask).astype(dt), the second applies BN-affine + ReLU in dt and
    # re-masks — so round the f32 dot output to dt before the affine and
    # multiply by the canvas mask on both sides.
    mask_i = win[C:C + 1, m0 * S:m0 * S + ri * S]
    inter = _mul_rows(inter, mask_i).astype(act.dtype)
    inter = _mul_rows(jnp.maximum(inter * a2[0] + a2[1], 0), mask_i)

    acc = None
    for t, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1)
                                 for dx in (-1, 0, 1)):
        off = (d2 + 1 + dy * d2) * S + dx * d2
        term = inter[:, off:off + RS] * dw2[t]
        acc = term if acc is None else acc + term
    out = jax.lax.dot_general(
        pw2, acc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    mask = c_ref[0, C:C + 1]
    o_ref[0, 0:pw2.shape[0]] = _mul_rows(out, mask).astype(o_ref.dtype)
    o_ref[0, pw2.shape[0]:] = mask.astype(o_ref.dtype)


def _dense_kernel(p_ref, c_ref, n_ref, aff_ref, w_ref, o_ref, *,
                  S, R, d, activate, precision):
    aff, w = aff_ref[0], w_ref[0]
    Ci = w.shape[2] // 3
    Co = w.shape[1]
    RS = R * S
    win = _window(p_ref, c_ref, n_ref)
    if activate:
        data = _activate(win, aff, Ci)
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
            w[t], sl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc = term if acc is None else acc + term
    mask = c_ref[0, win.shape[0] - 1:]  # see _dwsep_kernel: pads stay zero
    o_ref[0, 0:Co] = _mul_rows(acc, mask).astype(o_ref.dtype)
    o_ref[0, Co:] = mask.astype(o_ref.dtype)


def _dense2_kernel(pa_ref, ca_ref, na_ref, pb_ref, cb_ref, nb_ref,
                   affa_ref, wa_ref, affb_ref, wb_ref, o_ref, *,
                   S, R, d, precision):
    """Dense conv over the concatenation of two canvases WITHOUT the
    concat: conv(concat(a, b)) = conv_a(a) + conv_b(b), accumulated in one
    f32 register tile. Each half gets its own BN-affine + ReLU."""
    acc = None
    Co = wa_ref.shape[2]
    for p_ref, c_ref, n_ref, a_ref, w_ref in (
            (pa_ref, ca_ref, na_ref, affa_ref, wa_ref),
            (pb_ref, cb_ref, nb_ref, affb_ref, wb_ref)):
        aff, w = a_ref[0], w_ref[0]
        Ci = w.shape[2] // 3
        RS = R * S
        data = _activate(_window(p_ref, c_ref, n_ref), aff, Ci)
        for t, dx in enumerate((-1, 0, 1)):
            sl = jnp.concatenate(
                [data[:, 2 * d * S + dy * d * S + dx * d:
                      2 * d * S + dy * d * S + dx * d + RS]
                 for dy in (-1, 0, 1)], axis=0)
            term = jax.lax.dot_general(
                w[t], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            acc = term if acc is None else acc + term
    mask = ca_ref[0, ca_ref.shape[1] - 1:]
    o_ref[0, 0:Co] = _mul_rows(acc, mask).astype(o_ref.dtype)
    o_ref[0, Co:] = mask.astype(o_ref.dtype)


def dense2_layer(x: jnp.ndarray, kernel: jnp.ndarray, *, dilation: int,
                 S: int, NR: int, affine: jnp.ndarray,
                 block_rows: int = 0, out_dtype=None,
                 interpret: bool = False) -> jnp.ndarray:
    """Dense dilated 3x3 conv over the channel-concatenation of the two
    halves of a grouped canvas, without materializing the concat (a full
    extra canvas round trip through HBM — ~145 MB/frame at 368x1232).

    x: (2B, Ci+1, NR*S) — halves A = x[:B], B = x[B:], each with its own
    mask row; kernel: (3, 3, 2*Ci, Co) HWIO over the concatenated channels;
    affine: (2, 2*Ci) folded BN (pre-activation, split per half).
    Returns (B, Co+1, NR*S): conv(concat) = conv_A(A) + conv_B(B), exact.
    """
    B2 = x.shape[0]
    assert B2 % 2 == 0, B2
    B = B2 // 2
    Ci2, Co = kernel.shape[2], kernel.shape[3]
    Ci = Ci2 // 2
    assert x.shape[1] == Ci + 1, (x.shape, Ci)
    d = dilation
    R = block_rows or _block_rows(d)
    dt = x.dtype
    if dt == jnp.float32:
        # f32 doubles the six halo-view windows AND the per-dx K-stacked
        # (3Ci, R*S) temporaries; at R=48 the register allocator spills
        # ~237 MB of VMEM and Mosaic refuses. Narrow blocks restore it.
        R = max(16, 2 * d)
    width = (R + 4 * d) * S

    def wstack(k):  # (3 dx, Co, 3 dy * Ci), dy-major (see dense_layer)
        return jnp.stack([
            jnp.concatenate([k[dy, dx].T for dy in range(3)], axis=1)
            for dx in range(3)])[None].astype(dt)

    wa = wstack(kernel[:, :, :Ci])
    wb = wstack(kernel[:, :, Ci:])
    affa = _perch(affine[:, :Ci].reshape(1, 2, Ci, 1), width, dt)
    affb = _perch(affine[:, Ci:].reshape(1, 2, Ci, 1), width, dt)

    def views(boff):
        """prev/cur/next views of half `boff` (A: rows [0,B), B: [B,2B))."""
        base = _views(Ci + 1, S, NR, R, d)
        return [pl.BlockSpec(
            bs.block_shape,
            functools.partial(
                lambda im, off, b, c: (b + off,) + tuple(im(b, c))[1:],
                bs.index_map, boff),
            memory_space=pltpu.VMEM) for bs in base]

    def const_spec(c):
        return pl.BlockSpec((1,) + c.shape[1:],
                            lambda b, r: (0,) * c.ndim,
                            memory_space=pltpu.VMEM)

    consts = (affa, wa, affb, wb)
    # f32 doubles the six double-buffered halo-view windows; at R=16 the
    # scoped demand is ~127 MB — just inside the v5e's 128 MB VMEM, so the
    # f32 path gets the full budget (bf16 keeps comfortable headroom).
    vmem_mb = 127 if dt == jnp.float32 else 110
    return pl.pallas_call(
        functools.partial(_dense2_kernel, S=S, R=R, d=d,
                          precision=_precision(dt)),
        grid=(B, NR // R),
        in_specs=views(0) + views(B) + [const_spec(c) for c in consts],
        out_specs=pl.BlockSpec((1, Co + 1, R * S), lambda b, c: (b, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Co + 1, NR * S),
                                       out_dtype or dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, x, x, x, *consts)


def _call(kernel, x, consts, *, rows_in, rows_out, S, NR, R, d, out_dtype,
          interpret, groups=1):
    """Launch a row-canvas kernel. Every const carries a leading G axis
    (G == `groups`) blocked on the grid's batch index: batch b uses const
    block b // (B // G) — one weight set per contiguous batch group, which
    is how the two towers share a kernel chain. G == 1 degenerates to a
    single block Mosaic keeps resident across the grid."""
    B = x.shape[0]
    assert B % groups == 0, (B, groups)
    per = B // groups

    def const_spec(c):
        nd = c.ndim - 1
        return pl.BlockSpec(
            (1,) + c.shape[1:],
            functools.partial(
                lambda nd_, b, r: (b // per,) + (0,) * nd_, nd),
            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B, NR // R),
        in_specs=_views(rows_in, S, NR, R, d)
        + [const_spec(c) for c in consts],
        out_specs=pl.BlockSpec((1, rows_out, R * S), lambda b, c: (b, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows_out, NR * S), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, *consts)


def _precision(dt):
    return jax.lax.Precision.HIGHEST if dt == jnp.float32 else None


def _perch(w, width: int, dt):
    """Per-channel weight operand: compact (.., C, 1) by default (the
    kernels' jnp broadcasting replicates along lanes), or pre-broadcast to
    `width` lanes when COMPACT_WEIGHTS is off."""
    if COMPACT_WEIGHTS:
        return w.astype(dt)
    return jnp.broadcast_to(w, w.shape[:-1] + (width,)).astype(dt)


def _with_group_axis(w, groups: int, base_ndim: int):
    """Ensure a weight operand carries the leading (G, ...) group axis."""
    w = jnp.asarray(w)
    if w.ndim == base_ndim:
        assert groups == 1, (w.shape, groups)
        return w[None]
    assert w.shape[0] == groups, (w.shape, groups)
    return w


def dwsep_layer(x: jnp.ndarray, affine: jnp.ndarray, dwk: jnp.ndarray,
                pwk: jnp.ndarray, *, dilation: int, S: int, NR: int,
                groups: int = 1, block_rows: int = 0,
                interpret: bool = False) -> jnp.ndarray:
    """Fused BN-affine + ReLU + depthwise dilated 3x3 + pointwise 1x1 on a
    canvas. x: (B, C+1, NR*S); affine: ([G,] 2, C); dwk: ([G,] 3, 3, 1, C)
    HWIO; pwk: ([G,] Co, C). With `groups` G > 1, batch b uses weight set
    b // (B // G). Returns a (B, Co+1, NR*S) canvas."""
    affine = _with_group_axis(affine, groups, 2)
    dwk = _with_group_axis(dwk, groups, 4)
    pwk = _with_group_axis(pwk, groups, 2)
    G, C, Co = groups, pwk.shape[2], pwk.shape[1]
    d = dilation
    R = block_rows or _block_rows(d)
    dt = x.dtype
    width = (R + 4 * d) * S  # window incl. the 2d-row halo views
    aff = _perch(affine.reshape(G, 2, C, 1), width, dt)
    dwt = _perch(dwk.reshape(G, 9, C)[:, :, :, None], R * S, dt)
    return _call(
        functools.partial(_dwsep_kernel, S=S, R=R, d=d,
                          precision=_precision(dt)),
        x, (aff, dwt, pwk.astype(dt)), rows_in=C + 1, rows_out=Co + 1,
        S=S, NR=NR, R=R, d=d, out_dtype=dt, interpret=interpret,
        groups=groups)


def dwsep2_layer(x: jnp.ndarray, affine1, dwk1, pwk1, affine2, dwk2, pwk2,
                 *, dilation1: int, dilation2: int, S: int, NR: int,
                 groups: int = 1, block_rows: int = PAIR_UNIT,
                 interpret: bool = False) -> jnp.ndarray:
    """Two consecutive dw-sep layers in ONE kernel (see `_dwsep2_kernel`).
    Args as `dwsep_layer`, twice; requires NR and block_rows divisible by
    2*(dilation1 + dilation2). Returns (B, Co2+1, NR*S)."""
    a1 = _with_group_axis(affine1, groups, 2)
    k1 = _with_group_axis(dwk1, groups, 4)
    p1 = _with_group_axis(pwk1, groups, 2)
    a2 = _with_group_axis(affine2, groups, 2)
    k2 = _with_group_axis(dwk2, groups, 4)
    p2 = _with_group_axis(pwk2, groups, 2)
    G = groups
    C, Cm, Co = p1.shape[2], p1.shape[1], p2.shape[1]
    d1, d2 = dilation1, dilation2
    D = d1 + d2
    R = block_rows
    dt = x.dtype
    width = (R + 4 * D) * S
    ri = R + 2 * d2 + 2
    aff1 = _perch(a1.reshape(G, 2, C, 1), width, dt)
    dwt1 = _perch(k1.reshape(G, 9, C)[:, :, :, None], ri * S, dt)
    aff2 = _perch(a2.reshape(G, 2, Cm, 1), ri * S, dt)
    dwt2 = _perch(k2.reshape(G, 9, Cm)[:, :, :, None], R * S, dt)
    return _call(
        functools.partial(_dwsep2_kernel, S=S, R=R, D=D, d1=d1, d2=d2,
                          precision=_precision(dt)),
        x, (aff1, dwt1, p1.astype(dt), aff2, dwt2, p2.astype(dt)),
        rows_in=C + 1, rows_out=Co + 1, S=S, NR=NR, R=R, d=D,
        out_dtype=dt, interpret=interpret, groups=groups)


def _chain_margins(dilations):
    """Input-side row margins per chained layer: layer i's input value must
    extend m[i] rows past the R output rows on each side, where
    m[i] = m[i+1] + d[i] + 1 (the +1 covers the corner taps' lane overhang
    crossing into the neighboring canvas row — same accounting as
    `_dwsep2_kernel`'s intermediate). m[0] bounds the halo the window must
    provide (<= 2*dh)."""
    n = len(dilations)
    m = [0] * (n + 1)
    for i in reversed(range(n)):
        m[i] = m[i + 1] + dilations[i] + 1
    return m


def _chain_kernel(*refs, S, R, dh, dils, n_in, Cis, Cos, has_aff,
                  precision, out_dtype):
    """N dense dilated 3x3 conv layers in ONE kernel; every intermediate
    lives only as a VMEM value. Taps are 9 accumulating MXU dots per layer
    (operand slices are layout-aligned row-shift views plus a <=d-lane
    rotate — no K-stack concatenation pass over the data).

    refs: n_in view-triples (prev/cur/next of 2*dh, R, 2*dh rows), then per
    layer [affine?] + weights (G-blocked consts), then the output ref.
    With n_in == 2 the first layer is the two-input dense (dense2): it sums
    conv_a(half A) + conv_b(half B) and consumes TWO weight operands."""
    views = refs[:3 * n_in]
    consts = list(refs[3 * n_in:-1])
    o_ref = refs[-1]
    m = _chain_margins(dils)
    n = len(dils)

    def win_of(k):
        return _window(*views[3 * k:3 * k + 3])

    mask_full = win_of(0)[Cis[0]:Cis[0] + 1]  # (1, (R+4dh)*S)

    def mask_rows(margin):
        off = (2 * dh - margin) * S
        return mask_full[:, off:off + (R + 2 * margin) * S]

    def conv9(data, w, d, margin_in, margin_out, acc=None):
        """data: (Ci, (R+2*margin_in)*S) value; w: (9, Co, Ci). Returns
        f32 (Co, (R+2*margin_out)*S) accumulating into `acc`."""
        span = (R + 2 * margin_out) * S
        base = margin_in - margin_out
        for t, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1)
                                     for dx in (-1, 0, 1)):
            off = (base + dy * d) * S + dx * d
            sl = data[:, off:off + span]
            term = jax.lax.dot_general(
                w[t], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            acc = term if acc is None else acc + term
        return acc

    ci = 0  # const cursor
    v = None
    for i in range(n):
        d = dils[i]
        margin_in = 2 * dh if i == 0 else m[i]
        margin_out = m[i + 1]
        if i == 0:
            inputs = [win_of(k)[:Cis[0]] for k in range(n_in)]
        else:
            inputs = [v]
        if has_aff[i]:
            aff = consts[ci][0]
            ci += 1
        else:
            aff = None
        acc = None
        for j, data in enumerate(inputs):
            w = consts[ci][0]
            ci += 1
            if aff is not None:
                C = Cis[i]
                a = aff[:, j * C:(j + 1) * C] if n_in > 1 and i == 0 else aff
                data = _mul_rows(jnp.maximum(data * a[0] + a[1], 0),
                                 mask_rows(margin_in) if i else
                                 mask_full)
            acc = conv9(data, w, d, margin_in, margin_out, acc)
        v = _mul_rows(acc, mask_rows(margin_out)).astype(
            out_dtype if i == n - 1 else mask_full.dtype)
    o_ref[0, 0:Cos[-1]] = v
    o_ref[0, Cos[-1]:] = mask_rows(0).astype(o_ref.dtype)


def chain_layer(x: jnp.ndarray, kernels, affines, *, dilations, S: int,
                NR: int, groups: int = 1, block_rows: int = 48,
                dh: int = 24, two_input: bool = False, out_dtype=None,
                interpret: bool = False) -> jnp.ndarray:
    """Run N dense dilated 3x3 conv layers as ONE Pallas kernel (the
    "chain" rows variant): the input canvas is read once, the output canvas
    written once, and every intermediate activation stays in VMEM. Halo
    recompute grows each layer's computed rows by its remaining-chain
    margin (`_chain_margins`); the MXU absorbs the extra dots.

    x: (G*B, Ci0+1, NR*S) canvas. kernels[i]: ([G,]3,3,Ci,Co) HWIO — for
    two_input, kernels[0] is over the channel-concat of the two halves
    (2*Ci0 input channels, split internally as in `dense2_layer`).
    affines[i]: ([G,]2,Ci) folded BN applied BEFORE layer i (None = no
    activation, e.g. the entry and output convs). dilations[i]: per layer.
    Requires m[0] <= 2*dh (asserted), R % (2*dh) == 0, NR % R == 0.
    Returns ([G*]B, Co_last+1, NR*S).
    """
    n = len(dilations)
    assert len(kernels) == n and len(affines) == n
    m = _chain_margins(dilations)
    R = block_rows
    assert m[0] <= 2 * dh, (m, dh)
    assert R % (2 * dh) == 0 and NR % R == 0 and NR % (2 * dh) == 0, \
        (R, dh, NR)
    dt = x.dtype
    B2 = x.shape[0]
    n_in = 2 if two_input else 1
    if two_input:
        assert B2 % 2 == 0 and groups == 1, (B2, groups)

    kernels = [_with_group_axis(k, groups, 4) for k in kernels]
    G = groups
    Cis = [k.shape[3] // (2 if (two_input and i == 0) else 1)
           for i, k in enumerate(kernels)]
    Cos = [k.shape[4] for k in kernels]
    Ci0 = Cis[0]
    assert x.shape[1] == Ci0 + 1, (x.shape, Ci0)

    def w9(k):  # ([G,]3,3,Ci,Co) -> (G, 9, Co, Ci)
        return jnp.stack([
            jnp.stack([k[g, dy, dx].T for dy in range(3) for dx in range(3)])
            for g in range(G)]).astype(dt)

    consts, has_aff = [], []
    for i in range(n):
        if affines[i] is not None:
            a = _with_group_axis(affines[i], groups, 2)
            consts.append(a.reshape(G, 2, a.shape[2], 1).astype(dt))
            has_aff.append(True)
        else:
            has_aff.append(False)
        if two_input and i == 0:
            consts.append(w9(kernels[0][:, :, :, :Ci0]))
            consts.append(w9(kernels[0][:, :, :, Ci0:]))
        else:
            consts.append(w9(kernels[i]))

    out_dt = out_dtype or dt
    B = B2 // n_in

    def views(boff):
        base = _views(Ci0 + 1, S, NR, R, dh)
        if boff == 0:
            return base
        return [pl.BlockSpec(
            bs.block_shape,
            functools.partial(
                lambda im, off, b, c: (b + off,) + tuple(im(b, c))[1:],
                bs.index_map, boff),
            memory_space=pltpu.VMEM) for bs in base]

    per = B // G if G else B

    def const_spec(c):
        nd = c.ndim - 1
        return pl.BlockSpec(
            (1,) + c.shape[1:],
            functools.partial(
                lambda nd_, b, r: (b // per,) + (0,) * nd_, nd),
            memory_space=pltpu.VMEM)

    in_specs = sum([views(k * B) for k in range(n_in)], []) \
        + [const_spec(c) for c in consts]
    return pl.pallas_call(
        functools.partial(_chain_kernel, S=S, R=R, dh=dh,
                          dils=tuple(dilations), n_in=n_in,
                          Cis=tuple(Cis), Cos=tuple(Cos),
                          has_aff=tuple(has_aff),
                          precision=_precision(dt), out_dtype=out_dt),
        grid=(B, NR // R),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Cos[-1] + 1, R * S), lambda b, c: (b, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cos[-1] + 1, NR * S), out_dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*([x] * (3 * n_in)), *consts)


def dense_layer(x: jnp.ndarray, kernel: jnp.ndarray, *, dilation: int,
                S: int, NR: int, affine: jnp.ndarray = None,
                groups: int = 1, block_rows: int = 0,
                out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """Dense dilated 3x3 conv on a canvas, optionally preceded by folded
    BN-affine + ReLU. x: (B, Ci+1, NR*S); kernel: ([G,] 3, 3, Ci, Co) HWIO.
    Returns (B, Co+1, NR*S)."""
    kernel = _with_group_axis(kernel, groups, 4)
    G = groups
    _, _, _, Ci, Co = kernel.shape
    d = dilation
    R = block_rows or _block_rows(d)
    dt = x.dtype
    if dt == jnp.float32:
        # f32 doubles the halo-view windows and the K-stacked temporaries;
        # at R=32+ the scoped VMEM demand overflows the v5e at full eval
        # width (measured r5: the 368x1232 mxu pipeline's entry kernel
        # OOMs). Narrow blocks restore it — same fix as dense2_layer.
        R = max(16, 2 * d)
    width = (R + 4 * d) * S  # window incl. the 2d-row halo views
    # (G, 3 dx, Co, 3 dy * Ci), dy-major rows to match the kernel's K-stack.
    w = jnp.stack([
        jnp.stack([
            jnp.concatenate([kernel[g, dy, dx].T for dy in range(3)], axis=1)
            for dx in range(3)])
        for g in range(G)]).astype(dt)
    if affine is not None:
        affine = _with_group_axis(affine, groups, 2)
        aff = _perch(affine.reshape(G, 2, Ci, 1), width, dt)
    else:
        aff = jnp.zeros((G, 2, 1, 1), dt)  # placeholder, unused
    return _call(
        functools.partial(_dense_kernel, S=S, R=R, d=d,
                          activate=affine is not None,
                          precision=_precision(dt)),
        x, (aff, w), rows_in=Ci + 1, rows_out=Co + 1, S=S, NR=NR, R=R, d=d,
        out_dtype=out_dtype or dt, interpret=interpret, groups=groups)
