"""Headline benchmark: 4-stage inference frames/s on the 368x1232 KITTI eval
window (the reference's measured configuration, reference: inference.py:107-111;
baseline 10 FPS on a Titan Xp, README.md:136).

Timing uses `lwsnet_tpu.utils.timing.device_time`: the forward runs inside a
single jitted fori_loop (async dispatch and tunnel round trips cannot fake
the number), two-point differenced to cancel dispatch overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — the
4-stage number. Per-stage FPS (the anytime axis, num_stages=1..4), the
XLA-only path, and an MFU estimate are written to BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import os

import numpy as np

BASELINE_FPS = 10.0  # Titan Xp, all 4 stages (reference README.md:136)

# Peak dense bf16 matmul throughput per chip, for the MFU estimate.
_PEAK_FLOPS = {
    "TPU v5 lite": 394e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Pallas/Mosaic kernel compiles are minutes-scale cold; the persistent
    # cache makes reruns start in seconds.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lwsnet_tpu import LWSNet, ModelConfig
    from lwsnet_tpu.inference import make_forward
    from lwsnet_tpu.utils.timing import device_time

    cfg = ModelConfig()  # bf16 compute, Pallas refinement kernels on
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
              "use_pallas": cfg.use_pallas, "pallas_mode": cfg.pallas_mode}

    # Per-stage FPS: the anytime contract — stage k compiles a program
    # containing only stages 1..k.
    sec4 = None
    for k in (1, 2, 3, 4):
        fwd = make_forward(model, num_stages=k)
        sec = device_time(lambda l, r: fwd(variables, l, r),
                          left, right, iters=10) / batch
        detail[f"stage{k}_fps"] = round(1.0 / sec, 2)
        if k == 4:
            sec4 = sec

    # The XLA-only stage-4 path, to keep the Pallas win measurable.
    fwd_xla = make_forward(model, num_stages=4, use_pallas=False)
    sec_xla = device_time(lambda l, r: fwd_xla(variables, l, r),
                          left, right, iters=10) / batch
    detail["stage4_fps_no_pallas"] = round(1.0 / sec_xla, 2)

    # MFU: XLA's own flop count for the 4-stage program / measured time.
    try:
        fwd4 = make_forward(model, num_stages=4)
        cost = (jax.jit(fwd4).lower(variables, left, right)
                .compile().cost_analysis())
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        peak = _PEAK_FLOPS.get(detail["device"])
        detail["model_gflops"] = round(flops / 1e9, 2)
        if peak and flops > 0:
            detail["mfu_pct"] = round(100.0 * flops / sec4 / peak, 3)
    except Exception as e:  # cost_analysis is best-effort across backends
        detail["mfu_error"] = str(e)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    fps = 1.0 / sec4
    print(json.dumps({
        "metric": "4stage_inference_fps_368x1232",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
