"""Microbenchmark: rows-mode refinement kernels at the 368x1232 eval shape.

Breaks the ~5.3 ms stage-4 refinement (BENCH_DETAIL r3) into per-kernel
costs to target the r4 ">=150 FPS" work: per-layer dwsep/dense times by
dilation, the canvas transposes, operand-broadcast overhead, and the
whole refine_residual for reference.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


RESULTS: dict = {}


def main() -> None:
    import argparse
    import json

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default="",
                    help="also dump every measurement to this JSON file")
    ap.add_argument("--full", action="store_true",
                    help="also run the slow-compiling pair-kernel probes "
                         "(dwsep2 at taller blocks etc.)")
    cli = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from lwsnet_tpu.ops.pallas import refine_rows as R
    from lwsnet_tpu.utils.timing import device_time

    import builtins

    _print = builtins.print

    def print(line):  # noqa: A001 - log AND record "label: x ms" lines
        _print(line, flush=True)
        if ":" in line and line.rstrip().endswith("ms"):
            label, val = line.rsplit(":", 1)
            RESULTS[label.strip()] = float(val.strip().split()[0])

    H, W = 368, 1232
    S, NR = R.canvas_geom(H, W)
    print(f"canvas: S={S} NR={NR} ({NR * S * 2 / 1e6:.1f} MB/row bf16)")
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def t(fn, *args, iters=50):
        return device_time(fn, *args, iters=iters) * 1e3

    C = 32
    x = jnp.asarray(rng.standard_normal((1, C + 1, NR * S)), dt)
    aff = jnp.asarray(rng.standard_normal((2, C)), jnp.float32)
    dwk = jnp.asarray(rng.standard_normal((3, 3, 1, C)), jnp.float32)
    pwk = jnp.asarray(rng.standard_normal((C, C)), jnp.float32)

    # per-layer dwsep by dilation
    for d in (2, 4, 8, 16):
        ms = t(lambda a: R.dwsep_layer(a, aff, dwk, pwk, dilation=d,
                                       S=S, NR=NR), x)
        print(f"dwsep d={d:2d}:        {ms:7.3f} ms")

    # 2-batch (the two towers share shapes; do they pipeline better batched?)
    x2 = jnp.asarray(rng.standard_normal((2, C + 1, NR * S)), dt)
    for d in (2, 16):
        ms = t(lambda a: R.dwsep_layer(a, aff, dwk, pwk, dilation=d,
                                       S=S, NR=NR), x2)
        print(f"dwsep d={d:2d} B=2:    {ms:7.3f} ms")

    # composed-dense dw-sep (the "mxu" variant): same layer as ONE dense
    # MXU matmul over the rank-1 kernel dw*pw (refine_pallas._compose_dwsep)
    from lwsnet_tpu.models.refine_pallas import _compose_dwsep

    ck = np.asarray(_compose_dwsep(jnp.asarray(dwk), jnp.asarray(pwk)))
    ckj = jnp.asarray(ck)
    for d in (2, 4, 8, 16):
        ms = t(lambda a, dd=d: R.dense_layer(a, ckj, dilation=dd, S=S, NR=NR,
                                             affine=aff), x)
        print(f"mxu-dense d={d:2d}:    {ms:7.3f} ms")
        ms = t(lambda a, dd=d: R.dense_layer(a, ckj, dilation=dd, S=S, NR=NR,
                                             affine=aff), x2)
        print(f"mxu-dense d={d:2d} B=2: {ms:7.3f} ms")
    for rb in (64, 96):
        Sr, NRr = R.canvas_geom(H, W, unit=rb)
        xr = jnp.asarray(rng.standard_normal((2, C + 1, NRr * Sr)), dt)
        ms = t(lambda a, rb=rb, Sr=Sr, NRr=NRr: R.dense_layer(
            a, ckj, dilation=16, S=Sr, NR=NRr, affine=aff,
            block_rows=rb), xr)
        print(f"mxu-dense d=16 R={rb} B=2: {ms:7.3f} ms")

    # dense layers at the three real shapes
    ek = jnp.asarray(rng.standard_normal((3, 3, 3, 32)), jnp.float32)
    x3 = jnp.asarray(rng.standard_normal((1, 4, NR * S)), dt)
    ms = t(lambda a: R.dense_layer(a, ek, dilation=1, S=S, NR=NR), x3)
    print(f"dense 3->32 d1:    {ms:7.3f} ms")

    hk = jnp.asarray(rng.standard_normal((3, 3, 64, 32)), jnp.float32)
    aff64 = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    x64 = jnp.asarray(rng.standard_normal((1, 65, NR * S)), dt)
    ms = t(lambda a: R.dense_layer(a, hk, dilation=8, S=S, NR=NR,
                                   affine=aff64), x64)
    print(f"dense 64->32 d8:   {ms:7.3f} ms")

    ok = jnp.asarray(rng.standard_normal((3, 3, 32, 1)), jnp.float32)
    ms = t(lambda a: R.dense_layer(a, ok, dilation=1, S=S, NR=NR,
                                   out_dtype=jnp.float32), x)
    print(f"dense 32->1 d1:    {ms:7.3f} ms")

    # head entry as concat+dense (two HBM round trips of the 65-row canvas)
    # vs the fused two-input dense2 (reads the grouped tower canvas as-is)
    ms = t(lambda a: R.dense_layer(
        jnp.concatenate([a[:1, :C], a[1:, :C], a[:1, C:]], axis=1),
        hk, dilation=8, S=S, NR=NR, affine=aff64), x2)
    print(f"concat+dense 64->32 d8: {ms:7.3f} ms")
    ms = t(lambda a: R.dense2_layer(a, hk, dilation=8, S=S, NR=NR,
                                    affine=aff64, block_rows=48), x2)
    print(f"dense2 64->32 d8:  {ms:7.3f} ms")

    # paired vs unpaired dw-sep pipelines, tower pairs at B=2
    # (the r4 A/B ask: does pair fusion's halo recompute cancel its
    #  HBM savings?). Each pipeline runs on its own canvas geometry, as in
    # refine_pallas._rows_mode: paired unit=48 (NR=432 at 368 rows),
    # unpaired unit=96 (NR=480 — solo d=16 blocks are 96 rows).
    S48, NR48 = R.canvas_geom(H, W, unit=R.PAIR_UNIT)
    xp = jnp.asarray(rng.standard_normal((2, C + 1, NR48 * S48)), dt)
    S96, NR96 = R.canvas_geom(H, W, unit=96)
    xs = jnp.asarray(rng.standard_normal((2, C + 1, NR96 * S96)), dt)
    for d1, d2 in ((2, 4), (8, 16)) if cli.full else ((2, 4),):
        ms = t(lambda a: R.dwsep2_layer(a, aff, dwk, pwk, aff, dwk, pwk,
                                        dilation1=d1, dilation2=d2,
                                        S=S48, NR=NR48, block_rows=48), xp)
        print(f"dwsep2 ({d1:2d},{d2:2d}) B=2: {ms:7.3f} ms")
        ms = t(lambda a: R.dwsep_layer(
            R.dwsep_layer(a, aff, dwk, pwk, dilation=d1, S=S96, NR=NR96),
            aff, dwk, pwk, dilation=d2, S=S96, NR=NR96,
            block_rows=96 if d2 == 16 else 0), xs)
        print(f"solo+solo ({d1:2d},{d2:2d}) B=2: {ms:7.3f} ms")
        if not cli.full:
            continue
        # taller pair blocks: halo recompute amortizes over 96 output rows
        # (e.g. (8,16): intermediate 130/96 = 1.35x vs 82/48 = 1.71x)
        ms = t(lambda a: R.dwsep2_layer(a, aff, dwk, pwk, aff, dwk, pwk,
                                        dilation1=d1, dilation2=d2,
                                        S=S96, NR=NR96, block_rows=96), xs)
        print(f"dwsep2 ({d1:2d},{d2:2d}) R=96 B=2: {ms:7.3f} ms")

    # canvas transposes
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    ms = t(lambda a: R.to_canvas(a, S, NR, dt), img)
    print(f"to_canvas 3ch:     {ms:7.3f} ms")
    y = jnp.asarray(rng.standard_normal((1, 2, NR * S)), jnp.float32)
    ms = t(lambda a: R.from_canvas(a, H, W, S, NR, 1), y)
    print(f"from_canvas 1ch:   {ms:7.3f} ms")

    # operand-broadcast overhead: the dwt (9, C, R*S) and aff (2, C, width)
    # pre-broadcasts, measured alone (XLA materialization cost per call)
    d = 16
    Rr = R._block_rows(d)
    width = (Rr + 4 * d) * S
    ms = t(lambda k: jnp.broadcast_to(k.reshape(9, C)[:, :, None],
                                      (9, C, Rr * S)).astype(dt) * 1.0, dwk)
    print(f"dwt broadcast:     {ms:7.3f} ms")
    ms = t(lambda a: jnp.broadcast_to(a.reshape(2, C, 1),
                                      (2, C, width)).astype(dt) * 1.0, aff)
    print(f"aff broadcast:     {ms:7.3f} ms")

    # can Mosaic lane-broadcast (C, 1) -> (C, N) in-kernel now? If yes the
    # big pre-broadcast operands can shrink to (·, C, 1).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def bkernel(v_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(v_ref[:], o_ref.shape)

    try:
        v = jnp.asarray(rng.standard_normal((C, 1)), dt)
        outb = pl.pallas_call(
            bkernel,
            out_shape=jax.ShapeDtypeStruct((C, 1024), dt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v)
        good = np.allclose(np.asarray(outb, np.float32),
                           np.broadcast_to(np.asarray(v, np.float32),
                                           (C, 1024)))
        print(f"in-kernel (C,1)->(C,N) lane broadcast: {'OK' if good else 'WRONG RESULT'}")
    except Exception as e:
        print(f"in-kernel lane broadcast: FAILS ({type(e).__name__})")

    # whole refinement for context
    from lwsnet_tpu import LWSNet, ModelConfig
    from lwsnet_tpu.models.refine_pallas import refine_residual

    cfg = ModelConfig()
    model = LWSNet(cfg)
    left = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), left, right, train=False)
    disp = jnp.asarray(rng.uniform(0, 100, (1, H, W, 1)), jnp.float32)
    for paired in (True, False):
        ms = t(lambda l, p=paired: refine_residual(
            variables, l, disp, mode="rows", paired=p), left, iters=20)
        print(f"refine_residual rows paired={int(paired)}: {ms:7.3f} ms")
    ms = t(lambda l: refine_residual(
        variables, l, disp, mode="rows", dw="mxu"), left, iters=20)
    print(f"refine_residual rows mxu: {ms:7.3f} ms")
    ms = t(lambda l: refine_residual(
        variables, l, disp, mode="rows", dw="chain"), left, iters=20)
    print(f"refine_residual rows chain: {ms:7.3f} ms")

    if cli.json:
        dev = jax.devices()[0].device_kind
        with open(cli.json, "w") as f:
            json.dump({"device": dev, "input": f"{H}x{W}",
                       "unit": "ms", "timings": RESULTS}, f, indent=1)
        _print(f"wrote {cli.json}")


if __name__ == "__main__":
    main()
