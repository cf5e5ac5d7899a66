"""Headline benchmark: 4-stage inference frames/s on the 368x1232 KITTI eval
window (the reference's measured configuration, reference: inference.py:107-111;
baseline 10 FPS on a Titan Xp, README.md:136).

Designed to ALWAYS print its JSON line inside a wall-clock budget
(default 480 s, env BENCH_BUDGET_S), cold cache included:

  1. The headline path is measured first, with the seconds-to-compile
     default config (pallas_mode="layers").
  2. Everything else — per-stage FPS, the XLA-only path, the hour-class
     "fused" refinement mode — is opportunistic: each step runs only if
     enough budget remains, and the fused mode is compiled in a SUBPROCESS
     with a hard deadline so a cold Mosaic compile can never hang the run.
     If the fused probe lands and is faster, it becomes the headline.

Timing uses `lwsnet_tpu.utils.timing.device_time`: the forward runs inside a
single jitted fori_loop (async dispatch and tunnel round trips cannot fake
the number), two-point differenced to cancel dispatch overhead.

MFU uses the analytical conv FLOP count (`lwsnet_tpu.utils.flops`) — NOT
XLA's cost_analysis, which omits custom-call/Pallas FLOPs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Details go to BENCH_DETAIL.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_FPS = 10.0  # Titan Xp, all 4 stages (reference README.md:136)
_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))

# Peak dense bf16 matmul throughput per chip, for the MFU estimate.
_PEAK_FLOPS = {
    "TPU v5 lite": 394e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
}


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _measure_stage4(pallas_mode: str, use_pallas: bool = True,
                    iters: int = 10) -> float:
    """Seconds per 4-stage forward at 368x1232, batch 1."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lwsnet_tpu import LWSNet, ModelConfig
    from lwsnet_tpu.inference import make_forward
    from lwsnet_tpu.utils.timing import device_time

    cfg = dataclasses.replace(ModelConfig(), pallas_mode=pallas_mode)
    model = LWSNet(cfg)
    h, w = 368, 1232
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), left, right, train=False)
    fwd = make_forward(model, num_stages=4, use_pallas=use_pallas)
    return device_time(lambda l, r: fwd(variables, l, r), left, right,
                       iters=iters)


def _probe_main(mode: str) -> None:
    """Subprocess entry: measure one stage-4 variant, print one JSON line."""
    _setup_jax()
    sec = _measure_stage4(mode)
    print(json.dumps({"mode": mode, "sec": sec}))


def main() -> None:
    jax = _setup_jax()
    import dataclasses

    import jax.numpy as jnp

    from lwsnet_tpu import LWSNet, ModelConfig
    from lwsnet_tpu.inference import make_forward
    from lwsnet_tpu.utils import flops as flops_lib
    from lwsnet_tpu.utils.timing import device_time

    cfg = ModelConfig()  # bf16, Pallas on, pallas_mode="layers" (seconds-compile)
    model = LWSNet(cfg)
    h, w, batch = 368, 1232, 1

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), left, right, train=False)

    detail = {"input": f"{h}x{w}", "batch": batch,
              "device": jax.devices()[0].device_kind,
              "compute_dtype": cfg.compute_dtype,
              "use_pallas": cfg.use_pallas, "pallas_mode": cfg.pallas_mode,
              "budget_s": _BUDGET_S}

    # 1. HEADLINE FIRST: the shipped default config, 4 stages. Everything
    #    after this point is optional detail.
    fwd4 = make_forward(model, num_stages=4)
    sec4 = device_time(lambda l, r: fwd4(variables, l, r), left, right,
                       iters=10) / batch
    detail["stage4_fps"] = round(1.0 / sec4, 2)
    best_sec, best_mode = sec4, cfg.pallas_mode

    # MFU from the analytical conv FLOP count (free: no extra compiles).
    flops = flops_lib.forward_flops(cfg, h, w, batch=batch, num_stages=4)
    detail["model_gflops_analytic"] = round(flops / 1e9, 2)
    detail["flop_accounting"] = (
        "conv MACs*2 only; elementwise/resize/soft-argmin and the one-hot "
        "warp matmul excluded (see lwsnet_tpu/utils/flops.py)")
    peak = _PEAK_FLOPS.get(detail["device"])
    if peak:
        detail["mfu_pct"] = round(100.0 * flops / sec4 / peak, 3)

    # 2. Per-stage FPS (the anytime contract): stage k's program contains
    #    only stages 1..k. ~seconds of compile each; gated on budget.
    for k in (1, 2, 3):
        if _remaining() < 120:
            detail["per_stage_skipped"] = f"budget (stage {k}+)"
            break
        fwd = make_forward(model, num_stages=k)
        sec = device_time(lambda l, r: fwd(variables, l, r), left, right,
                          iters=10) / batch
        detail[f"stage{k}_fps"] = round(1.0 / sec, 2)

    # 3. XLA-only stage-4 path: keeps the Pallas win measurable.
    if _remaining() > 120:
        fwd_xla = make_forward(model, num_stages=4, use_pallas=False)
        sec_xla = device_time(lambda l, r: fwd_xla(variables, l, r),
                              left, right, iters=10) / batch
        detail["stage4_fps_no_pallas"] = round(1.0 / sec_xla, 2)
    else:
        detail["xla_path_skipped"] = "budget"

    # 4. The "fused" refinement mode (hour-class cold Mosaic compile) in a
    #    subprocess with a hard deadline: warm-cache it lands in seconds and
    #    upgrades the headline; cold it is killed without hurting the run.
    probe_budget = _remaining() - 60
    if os.environ.get("BENCH_SKIP_FUSED") != "1" and probe_budget > 90:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe",
                 "fused"],
                capture_output=True, text=True, timeout=probe_budget,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
            res = json.loads(line)
            sec_fused = float(res["sec"]) / batch
            detail["stage4_fps_fused"] = round(1.0 / sec_fused, 2)
            if sec_fused < best_sec:
                best_sec, best_mode = sec_fused, "fused"
                if peak:
                    detail["mfu_pct"] = round(
                        100.0 * flops / sec_fused / peak, 3)
        except (subprocess.TimeoutExpired, ValueError, KeyError,
                IndexError, json.JSONDecodeError):
            detail["stage4_fps_fused"] = "probe timed out or failed"
    else:
        detail["fused_probe_skipped"] = "budget or BENCH_SKIP_FUSED"

    detail["headline_mode"] = best_mode
    detail["elapsed_s"] = round(time.monotonic() - _T0, 1)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    fps = 1.0 / best_sec
    print(json.dumps({
        "metric": "4stage_inference_fps_368x1232",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--probe", type=str, default=None,
                   help="internal: measure one pallas_mode and exit")
    args = p.parse_args()
    if args.probe:
        _probe_main(args.probe)
    else:
        main()
