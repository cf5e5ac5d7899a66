"""Inference-time Pallas path for the stage-4 refinement.

Bridges the Flax parameter tree of `RefinementTower`/`RefinementHead`
(lwsnet_tpu.models.refinement) to the Pallas refinement kernels
(`lwsnet_tpu.ops.pallas.refine_rows` for the default "rows" mode,
`lwsnet_tpu.ops.pallas.refine` for the planar "layers" mode): BatchNorm
running statistics are folded into per-channel affines (inference
semantics) and activations move to the canvas layouts the kernels want.

Semantically identical to the XLA modules in eval mode
(reference: models/submodules.py:282-326, wired at models/models.py:158-162);
the XLA path remains the training path and the correctness oracle
(tests/test_pallas_refine.py checks parity in interpreter mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lwsnet_tpu.ops.pallas import refine as K

# Dilation schedules of the reference towers/head
# (reference: models/submodules.py:282-326).
TOWER_DILATIONS = (2, 4, 8, 16)
HEAD_DILATIONS = (8, 4, 2, 1)
HEAD_DENSE_DILATION = 8

_BN_EPS = 1e-5  # matches nn.BatchNorm epsilon in lwsnet_tpu.models.blocks


def fold_bn(bn_params: dict, bn_stats: dict) -> jnp.ndarray:
    """Fold BatchNorm (inference mode) into a (2, C) affine (scale', shift'):
    y = x * scale' + shift' with scale' = gamma/sqrt(var+eps),
    shift' = beta - mean * scale'. Computed in float32."""
    a = bn_params["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bn_stats["var"].astype(jnp.float32) + _BN_EPS)
    b = bn_params["bias"].astype(jnp.float32) - \
        bn_stats["mean"].astype(jnp.float32) * a
    return jnp.stack([a, b])


def _dwsep_weights(params: dict, stats: dict, n_layers: int, dtype):
    """Stacked (affines, dwks, pwks) of `n_layers` PreConvDW blocks."""
    affs, dwks, pwks = [], [], []
    for i in range(n_layers):
        blk, bst = params[f"PreConvDW_{i}"], stats[f"PreConvDW_{i}"]
        affs.append(fold_bn(blk["BatchNorm_0"], bst["BatchNorm_0"]))
        dwks.append(blk["dw_kernel"])
        # Flax 1x1 conv kernel is (1, 1, Ci, Co) HWIO; the kernel wants
        # out-channel-major (Co, Ci).
        pwks.append(blk["Conv_0"]["kernel"][0, 0].T)
    return (jnp.stack(affs).astype(dtype), jnp.stack(dwks).astype(dtype),
            jnp.stack(pwks).astype(dtype))


def _tower_weights(params: dict, stats: dict, dtype):
    """(entry, affines, dwks, pwks) from a RefinementTower subtree."""
    entry = params["Conv_0"]["kernel"].astype(dtype)
    return (entry,) + _dwsep_weights(params, stats, len(TOWER_DILATIONS),
                                     dtype)


def _head_weights(params: dict, stats: dict, dtype):
    """(aff0, dense, affines, dwks, pwks, out_k) from a RefinementHead subtree."""
    pre = params["PreConv_0"]
    aff0 = fold_bn(pre["BatchNorm_0"],
                   stats["PreConv_0"]["BatchNorm_0"]).astype(dtype)
    dense = pre["Conv_0"]["kernel"].astype(dtype)
    affs, dwks, pwks = _dwsep_weights(params, stats, len(HEAD_DILATIONS),
                                      dtype)
    out_k = params["out_kernel"]  # cast by the mode runner
    return aff0, dense, affs, dwks, pwks, out_k


def _dwsep_chain(y, affs, dwks, pwks, dilations, chunk, h, w, interpret):
    """Run a dw-sep chain, fusing consecutive layers pairwise when the
    combined halo fits the chunk (one kernel per pair: the intermediate
    activation never leaves VMEM, halving HBM round trips)."""
    k = 0
    while k < len(dilations):
        d1 = dilations[k]
        if k + 1 < len(dilations) and chunk >= -(-(d1 + dilations[k + 1]) // 8) * 8:
            d2 = dilations[k + 1]
            y = K.fused_dwsep2(y, affs[k], dwks[k], pwks[k],
                               affs[k + 1], dwks[k + 1], pwks[k + 1],
                               dilation1=d1, dilation2=d2, chunk=chunk,
                               h_real=h, w_real=w, interpret=interpret)
            k += 2
        else:
            y = K.fused_dwsep(y, affs[k], dwks[k], pwks[k], dilation=d1,
                              chunk=chunk, h_real=h, w_real=w,
                              interpret=interpret)
            k += 1
    return y


def _tower_layers(xc, weights, chunk, h, w, interpret):
    """Per-layer-kernel tower: layer canvas in, layer canvas out."""
    entry, affs, dwks, pwks = weights
    y = K.fused_dense(xc, entry, dilation=1, chunk=chunk, h_real=h, w_real=w,
                      interpret=interpret)
    return _dwsep_chain(y, affs, dwks, pwks, TOWER_DILATIONS, chunk, h, w,
                        interpret)


def _head_layers(tower_l, tower_d, weights, chunk, h, w, dtype, interpret):
    """Head on the two tower canvases. The 64-channel entry conv is split
    into two 32-channel halves summed — exact math
    (conv(concat(a, b)) = conv_a(a) + conv_b(b)) that keeps every kernel at
    <=32 channels, so the whole chain shares one large chunk without
    blowing VMEM (the 64ch variant OOM'd at 151M/128M on v5e)."""
    aff0, dense, affs, dwks, pwks, out_k = weights
    F = tower_l.shape[1]
    y = K.fused_dense(tower_l, dense[:, :, :F], dilation=HEAD_DENSE_DILATION,
                      chunk=chunk, h_real=h, w_real=w, affine=aff0[:, :F],
                      interpret=interpret)
    y = y + K.fused_dense(tower_d, dense[:, :, F:],
                          dilation=HEAD_DENSE_DILATION, chunk=chunk,
                          h_real=h, w_real=w, affine=aff0[:, F:],
                          interpret=interpret)
    y = _dwsep_chain(y, affs, dwks, pwks, HEAD_DILATIONS, chunk, h, w,
                     interpret)
    # plain 3x3 -> 1 output conv (no BN/ReLU, reference: submodules.py:318-325)
    return K.fused_dense(y, out_k.astype(dtype), dilation=1, chunk=chunk,
                         h_real=h, w_real=w, interpret=interpret)


def _compose_dwsep(dwk: jnp.ndarray, pwk: jnp.ndarray) -> jnp.ndarray:
    """Fold a depthwise 3x3 kernel (3, 3, 1, C) HWIO and a pointwise kernel
    (Co, C) into the equivalent dense conv kernel (3, 3, C, Co):

        k[dy, dx, ci, co] = dw[dy, dx, ci] * pw[co, ci]

    Exact by associativity: pointwise(depthwise(x)) sums the same products
    in a different order. This turns the dw-sep layer's 9 per-channel VPU
    tap multiply-adds into one MXU matmul (contraction 3*C) — the "mxu"
    rows variant. The product is formed in f32 (the bf16 cast happens once,
    inside dense_layer)."""
    return (dwk[:, :, 0, :, None].astype(jnp.float32)
            * pwk.T[None, None].astype(jnp.float32))


def _rows_mode(p, s, left, disp, H, W, dtype, interpret, paired, dw):
    """Row-canvas refinement (ops/pallas/refine_rows): the default
    inference mode — seconds-class cold compile, fastest measured.

    Seven kernels for the whole 13-layer stage: the two towers run as ONE
    2B-batch chain (entry + two pair-fused dw-sep kernels) with per-tower
    weights selected by the grid's batch index — the disparity tower's
    1-channel input/entry zero-pad to the RGB tower's 3 channels, which is
    exact (zero input channels contribute nothing) — and the head runs as
    dense + two pair-fused dw-sep kernels + output conv.

    dw = "mxu" replaces every dw-sep kernel with a dense_layer over the
    composed rank-1 kernel (see `_compose_dwsep`): 13 dense kernels, all
    MXU matmuls. The VPU variants ("vpu", paired or not) spend ~9 vector
    multiply-adds per channel-row on the depthwise taps; the MXU variant
    spends MXU FLOPs instead, which at C=32 (K-stack contraction 96) the
    v5e has to spare."""
    from lwsnet_tpu.ops.pallas import refine_rows as R

    B = left.shape[0]
    # Unpaired geometry needs NR divisible by 96 too (solo d=16 runs at
    # R=96: the halo views' 2d-row block unit must divide R and NR).
    # The mxu pipeline's dense blocks run at the default 32 rows (d<=8)
    # and 32 | 96 for d=16, with the head entry at 48: unit 96 satisfies
    # every divisibility constraint at once.
    S, NR = R.canvas_geom(
        H, W, unit=96 if dw in ("mxu", "chain") else
        (R.PAIR_UNIT if paired else 96))
    Rb = R.PAIR_UNIT

    # The mxu path composes dw*pw weight products; keep those in f32 and
    # let dense_layer do the single canvas-dtype cast (one rounding, not
    # two). The VPU kernels take their operands pre-cast as before.
    wdt = jnp.float32 if dw in ("mxu", "chain") else dtype
    el, al, kl, pl_ = _tower_weights(p["RefinementTower_0"],
                                     s["RefinementTower_0"], wdt)
    ed, ad, kd, pd_ = _tower_weights(p["RefinementTower_1"],
                                     s["RefinementTower_1"], wdt)
    entries = jnp.stack([el, jnp.pad(ed, ((0, 0), (0, 0), (0, 2), (0, 0)))])

    def tw(i):
        """Layer i's grouped (affine, dwk, pwk): tower 0 = left, 1 = disp."""
        return (jnp.stack([al[i], ad[i]]), jnp.stack([kl[i], kd[i]]),
                jnp.stack([pl_[i], pd_[i]]))

    # Pair fusion halves canvas HBM round trips but RECOMPUTES layer-1
    # taps over the intermediate's halo rows (e.g. 82 vs 48 rows for the
    # (8,16) pair) — on a VPU-bound chain that can cancel the win, so the
    # unfused-but-batched variant stays selectable for measurement.
    x = jnp.concatenate(
        [left.astype(dtype),
         jnp.pad(disp.astype(dtype), ((0, 0), (0, 0), (0, 0), (0, 2)))],
        axis=0)
    y = R.to_canvas(x, S, NR, dtype)
    if dw == "chain":
        # Whole-chain kernels: ONE kernel runs the entry conv + all four
        # composed dw-sep layers of both towers (grouped, batch 2B), ONE
        # more runs the entire head (two-input dense + 4 composed layers +
        # output conv). Intermediates never leave VMEM; per-kernel cost on
        # this pipeline tracks elementwise passes over the canvas (measured
        # r5: pair fusion saved nothing, per-layer kernels cost ~0.35 ms
        # each at 368x1232 regardless of engine), so collapsing 13 launches
        # into 2 attacks the dominant term directly.
        tker = [entries] + [
            jnp.stack([_compose_dwsep(kl[i], pl_[i]),
                       _compose_dwsep(kd[i], pd_[i])])
            for i in range(len(TOWER_DILATIONS))]
        taff = [None] + [jnp.stack([al[i], ad[i]])
                         for i in range(len(TOWER_DILATIONS))]
        y = R.chain_layer(y, tker, taff, dilations=(1,) + TOWER_DILATIONS,
                          S=S, NR=NR, groups=2, interpret=interpret)
        aff0, dense, affs, dwks, pwks, out_k = _head_weights(
            p["RefinementHead_0"], s["RefinementHead_0"], wdt)
        hker = [dense] + [_compose_dwsep(dwks[i], pwks[i])
                          for i in range(len(HEAD_DILATIONS))] + [out_k]
        haff = [aff0] + [affs[i] for i in range(len(HEAD_DILATIONS))] + [None]
        y = R.chain_layer(y, hker, haff,
                          dilations=(HEAD_DENSE_DILATION,) + HEAD_DILATIONS
                          + (1,),
                          S=S, NR=NR, two_input=True,
                          out_dtype=jnp.float32, interpret=interpret)
        return R.from_canvas(y, H, W, S, NR, 1).astype(jnp.float32)
    y = R.dense_layer(y, entries, dilation=1, S=S, NR=NR, groups=2,
                      block_rows=Rb, interpret=interpret)
    if dw == "mxu":
        for i, d in enumerate(TOWER_DILATIONS):
            y = R.dense_layer(
                y, jnp.stack([_compose_dwsep(kl[i], pl_[i]),
                              _compose_dwsep(kd[i], pd_[i])]),
                dilation=d, S=S, NR=NR, groups=2,
                affine=jnp.stack([al[i], ad[i]]), interpret=interpret)
    elif paired:
        for i in (0, 2):  # pairs (2, 4) and (8, 16)
            y = R.dwsep2_layer(y, *tw(i), *tw(i + 1),
                               dilation1=TOWER_DILATIONS[i],
                               dilation2=TOWER_DILATIONS[i + 1],
                               S=S, NR=NR, groups=2, block_rows=Rb,
                               interpret=interpret)
    else:
        for i, d in enumerate(TOWER_DILATIONS):
            y = R.dwsep_layer(y, *tw(i), dilation=d, S=S, NR=NR, groups=2,
                              block_rows=96 if d == 16 else Rb,
                              interpret=interpret)

    aff0, dense, affs, dwks, pwks, out_k = _head_weights(
        p["RefinementHead_0"], s["RefinementHead_0"], wdt)
    # The head's 64-channel entry consumes concat(left tower, disp tower);
    # dense2_layer computes conv_l(tl) + conv_d(td) straight off the
    # grouped tower canvas — exact, and skips materializing the 65-row
    # concat canvas (a full HBM round trip, ~145 MB/frame at 368x1232).
    y = R.dense2_layer(y, dense, dilation=HEAD_DENSE_DILATION, S=S, NR=NR,
                       affine=aff0, block_rows=Rb, interpret=interpret)
    if dw == "mxu":
        for i, d in enumerate(HEAD_DILATIONS):
            y = R.dense_layer(y, _compose_dwsep(dwks[i], pwks[i]),
                              dilation=d, S=S, NR=NR, affine=affs[i],
                              interpret=interpret)
    elif paired:
        for i in (0, 2):  # pairs (8, 4) and (2, 1)
            y = R.dwsep2_layer(y, affs[i], dwks[i], pwks[i],
                               affs[i + 1], dwks[i + 1], pwks[i + 1],
                               dilation1=HEAD_DILATIONS[i],
                               dilation2=HEAD_DILATIONS[i + 1],
                               S=S, NR=NR, block_rows=Rb,
                               interpret=interpret)
    else:
        for i, d in enumerate(HEAD_DILATIONS):
            y = R.dwsep_layer(y, affs[i], dwks[i], pwks[i], dilation=d,
                              S=S, NR=NR, block_rows=Rb,
                              interpret=interpret)
    y = R.dense_layer(y, out_k.astype(dtype), dilation=1, S=S, NR=NR,
                      out_dtype=jnp.float32, block_rows=Rb,
                      interpret=interpret)
    return R.from_canvas(y, H, W, S, NR, 1).astype(jnp.float32)


def refine_residual(variables: dict, left: jnp.ndarray, disp: jnp.ndarray,
                    *, dtype=jnp.bfloat16, interpret: bool = False,
                    mode: str = "rows", paired: bool = True,
                    dw: str = "vpu") -> jnp.ndarray:
    """The stage-4 refinement residual via the fused Pallas kernels.

    Equals RefinementTower(left) ++ RefinementTower(disp) -> RefinementHead
    in eval mode (reference: models/models.py:158-162). Inference only: BN
    uses folded running statistics.

    mode:
      "rows"   — row-canvas per-layer kernels (ops/pallas/refine_rows):
        channels on matmul rows, 2-D vector values only, vertical taps as
        whole-row lane shifts. Seconds-class cold compile AND the fastest
        measured mode; the default.
      "layers" — one planar Pallas kernel per layer (fused_dense /
        fused_dwsep), canvases round-trip HBM between layers. ~270 s cold
        compile (every op unrolls over the C axis).

    (Two further modes — whole-chain kernels with hour-class Mosaic compiles
    — were removed: their cold compile never landed inside any benchmark
    budget and "rows" beat them on headroom anyway.)

    Args:
      variables: the full LWSNet {"params", "batch_stats"} tree.
      left: (B, H, W, 3) normalized image, NHWC.
      disp: (B, H, W, 1) stage-3 full-res disparity.
      paired: "rows" layer fusion (ModelConfig.rows_paired). The env var
        LWSNET_ROWS_PAIRED=0/1 overrides it — read HERE, at trace time, so
        a jit-cached forward ignores later env flips; it exists for A/B
        measurement scripts only.
      dw: "rows" depthwise engine (ModelConfig.rows_dw). "vpu" = 9-tap
        vector multiply-adds (paired/unpaired per `paired`); "mxu" = each
        dw-sep layer as one dense MXU matmul over the composed rank-1
        kernel (see `_compose_dwsep`); "chain" = the whole tower stack and
        the whole head as ONE whole-chain kernel each (composed dense
        layers, intermediates VMEM-resident — `refine_rows.chain_layer`).
        `paired` is irrelevant for mxu/chain. Env override LWSNET_ROWS_DW,
        trace-time, A/B scripts only.
    Returns:
      (B, H, W, 1) float32 residual (caller adds it to `disp`).
    """
    assert mode in ("rows", "layers"), mode
    import os as _os
    env = _os.environ.get("LWSNET_ROWS_PAIRED")
    if env is not None:
        paired = env != "0"
    dw = _os.environ.get("LWSNET_ROWS_DW", dw)
    assert dw in ("vpu", "mxu", "chain"), dw
    p, s = variables["params"], variables["batch_stats"]
    B, H, W, _ = left.shape
    if mode == "rows":
        return _rows_mode(p, s, left, disp, H, W, dtype, interpret, paired,
                          dw)
    xl = jnp.transpose(left.astype(dtype), (0, 3, 1, 2))
    xd = jnp.transpose(disp.astype(dtype), (0, 3, 1, 2))
    tw_l = _tower_weights(p["RefinementTower_0"], s["RefinementTower_0"],
                          dtype)
    tw_d = _tower_weights(p["RefinementTower_1"], s["RefinementTower_1"],
                          dtype)
    hw = _head_weights(p["RefinementHead_0"], s["RefinementHead_0"], dtype)

    # one chunk for the whole chain; the head's 64ch conv is split into two
    # 32ch halves (see _head_layers), so F=32 is the widest kernel.
    chunk = K.pick_layer_chunk(H, W, tw_l[3].shape[1])
    tower_l = _tower_layers(K.layer_canvas(xl, chunk), tw_l, chunk, H, W,
                            interpret)
    tower_d = _tower_layers(K.layer_canvas(xd, chunk), tw_d, chunk, H, W,
                            interpret)
    res = _head_layers(tower_l, tower_d, hw, chunk, H, W, dtype, interpret)
    res = K.layer_uncanvas(res, chunk, H, W)
    return jnp.transpose(res, (0, 2, 3, 1)).astype(jnp.float32)
