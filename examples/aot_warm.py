"""AOT-compile inference programs into the persistent cache (no execution).

The axon TPU plugin compiles through a chipless AOT helper, so programs can
be compiled (and land in `.jax_cache`) while another process holds the chip
for execution — compiles serialize with other processes' compiles but not
with their execution. Used to warm the cache for bench.py / microbenches
after kernel changes, without waiting for the chip.

    python examples/aot_warm.py [--dw chain] [--stages 4] [--h 368] [--w 1232]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dw", type=str, default="chain")
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--h", type=int, default=368)
    ap.add_argument("--w", type=int, default=1232)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lwsnet_tpu import LWSNet, ModelConfig
    from lwsnet_tpu.inference import make_forward

    cfg = ModelConfig(rows_dw=args.dw)
    model = LWSNet(cfg)
    B, H, W = args.batch, args.h, args.w
    l = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
    r = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
    # Abstract init: variable SHAPES only — nothing executes or is even
    # allocated on any device (every input is a ShapeDtypeStruct).
    import functools
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((1, 64, 128, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 64, 128, 3), jnp.float32))
    fwd = make_forward(model, num_stages=args.stages)
    t0 = time.time()
    lowered = jax.jit(fwd).lower(variables, l, r)
    compiled = lowered.compile()
    print(f"compiled rows_dw={args.dw} stages={args.stages} {H}x{W} "
          f"in {time.time() - t0:.1f}s; "
          f"flops={compiled.cost_analysis().get('flops', 0):.3e}")


if __name__ == "__main__":
    main()
