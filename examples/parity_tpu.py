"""Real-TPU Pallas-vs-XLA parity check on the golden pair (PARITY_TPU.json).

The interpret-mode parity tests (tests/test_pallas_refine.py,
tests/test_pallas_costfilter.py) pin kernel semantics on CPU, but cannot see
Mosaic lowering bugs. This runs BOTH stage-4 paths on the actual chip —
the XLA module path (the training path / correctness oracle) and the Pallas
kernel path (the inference default) — on the reference's committed stereo
pair, and records per-stage max-abs / mean-abs deltas plus a PASS verdict.

    python examples/parity_tpu.py [--out PARITY_TPU.json]

PASS bar: every stage finite on both paths, and mean |delta| < 2% of the
XLA stage's value span (bf16 compute: the two paths round differently
per-op, so bit-exactness is not expected; f32 runs use a 0.1% bar).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN_DIR = "/root/reference/reference"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="PARITY_TPU.json")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--left_img", type=str, default="")
    p.add_argument("--right_img", type=str, default="",
                   help="explicit stereo pair (used at its native size, "
                        "no crop). With a checkpoint trained on the "
                        "synthetic proof corpus, pass one of ITS pairs: "
                        "on out-of-distribution input the cost volumes "
                        "are near-flat and the comparison re-enters the "
                        "chaotic regime trained weights exist to avoid "
                        "(r5: the golden pair reads 8-45% span deltas "
                        "under overfit-proof weights, an in-distribution "
                        "pair reads sub-percent).")
    p.add_argument("--ckpt", type=str, default="",
                   help="checkpoint directory to load params from (e.g. the "
                        "overfit-proof run). At RANDOM weights the cost "
                        "volumes are near-flat and the soft-argmin cascade "
                        "amplifies benign bf16 rounding differences between "
                        "any two compilations into multi-pixel deltas — "
                        "measured ~12%% of span XLA-vs-Pallas AND a similar "
                        "spread between two XLA-only programs; trained "
                        "weights give sharp costs and a conditioned "
                        "comparison.")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lwsnet_tpu import LWSNet, ModelConfig, TrainConfig
    from lwsnet_tpu.data import transforms as T
    from lwsnet_tpu.inference import make_forward
    from lwsnet_tpu.training.state import create_train_state

    cfg = ModelConfig(compute_dtype=args.dtype)
    model = LWSNet(cfg)
    state = create_train_state(model, TrainConfig(), jax.random.PRNGKey(0),
                               (64, 128))
    weights = "random-init"
    if args.ckpt:
        from lwsnet_tpu.training.checkpoint import CheckpointManager
        restored, _ = CheckpointManager(args.ckpt).restore(state)
        assert restored is not None, f"no checkpoint under {args.ckpt}"
        state = restored
        weights = args.ckpt
    if args.left_img:
        left = T.normalize(T.load_image(args.left_img))
        right = T.normalize(T.load_image(args.right_img or args.left_img))
        pair_desc = f"{args.left_img} (native size)"
    else:
        left = T.normalize(T.bottom_right_crop(
            T.load_image(os.path.join(GOLDEN_DIR, "left_test.png")),
            368, 1232))
        right = T.normalize(T.bottom_right_crop(
            T.load_image(os.path.join(GOLDEN_DIR, "right_test.png")),
            368, 1232))
        pair_desc = "golden pair, 368x1232 bottom-right crop"
    import jax.numpy as jnp
    l, r = jnp.asarray(left[None]), jnp.asarray(right[None])

    fn_pallas = jax.jit(make_forward(model, num_stages=4, use_pallas=True))
    fn_xla = jax.jit(make_forward(model, num_stages=4, use_pallas=False))
    try:
        outs_p = jax.block_until_ready(fn_pallas(state.variables, l, r))
    except Exception as e:
        # Known: Mosaic (current TPU toolchain) refuses the f32 sublane
        # broadcasts the kernels' mask multiplies need — bf16 (the
        # production inference dtype) compiles and is the meaningful
        # parity check. Record the refusal instead of crashing so the
        # artifact documents the limitation.
        result = {
            "device": jax.devices()[0].device_kind,
            "backend": jax.default_backend(),
            "weights": weights,
            "compute_dtype": args.dtype,
            "pallas_compile_error": f"{type(e).__name__}: {e}"[:400],
            "pass": False,
        }
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, allow_nan=False)
        print(json.dumps(result, allow_nan=False))
        sys.exit(2)
    outs_x = jax.block_until_ready(fn_xla(state.variables, l, r))

    bar = 0.001 if args.dtype == "float32" else 0.02
    stages, ok = [], True
    for i, (a, b) in enumerate(zip(outs_x, outs_p)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        finite = bool(np.isfinite(a).all() and np.isfinite(b).all())
        span = float(a.max() - a.min()) + 1e-9
        mean_d = float(np.abs(a - b).mean())
        stage_ok = finite and mean_d < bar * span
        ok &= stage_ok
        stages.append({
            "stage": i + 1, "finite": finite,
            "xla_span": round(span, 4),
            "max_abs_delta": round(float(np.abs(a - b).max()), 4),
            "mean_abs_delta": round(mean_d, 5),
            "mean_delta_pct_of_span": round(100.0 * mean_d / span, 3),
            "ok": stage_ok,
        })

    result = {
        "device": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "input": pair_desc,
        "weights": weights,
        "compute_dtype": args.dtype,
        "pallas_mode": cfg.pallas_mode,
        "rows_dw": os.environ.get("LWSNET_ROWS_DW", cfg.rows_dw),
        "bar": f"mean |delta| < {bar * 100:g}% of XLA span per stage",
        "stages": stages,
        "pass": ok,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, allow_nan=False)
    print(json.dumps(result, allow_nan=False))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
