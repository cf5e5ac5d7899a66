"""Headline benchmark: 4-stage inference frames/s on the 368x1232 KITTI eval
window (the reference's measured configuration, reference: inference.py:107-111;
baseline 10 FPS on a Titan Xp, README.md:136).

Timing uses `lwsnet_tpu.utils.timing.device_time`: the forward runs inside a
single jitted fori_loop (async dispatch and tunnel round trips cannot fake
the number), two-point differenced to cancel dispatch overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json

import numpy as np

BASELINE_FPS = 10.0  # Titan Xp, all 4 stages (reference README.md:136)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lwsnet_tpu import LWSNet, ModelConfig
    from lwsnet_tpu.utils.timing import device_time

    cfg = ModelConfig()  # bf16 compute
    model = LWSNet(cfg)
    h, w, batch = 368, 1232, 1

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), left, right, train=False)

    sec_per_frame = device_time(
        lambda l, r: model.apply(variables, l, r, train=False),
        left, right, iters=10) / batch

    fps = 1.0 / sec_per_frame
    print(json.dumps({
        "metric": "4stage_inference_fps_368x1232",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
