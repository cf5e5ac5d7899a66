"""CPU-f32 ground-truth evaluation of a checkpoint on the proof corpus.

Why this exists (r5 measurement): at half-converged states this
architecture is numerically CHAOTIC across program boundaries — the
cascaded soft-argmin amplifies reduction-order ulps into multi-pixel
output differences, so two TPU programs of the same function can disagree
by px while both are "correct" floating-point evaluations. Measured: a
tail checkpoint read 10.30 px under the TPU eval program and 3.84 px
under per-pair CPU-f32 (the train program agreed with CPU). Converged
states are stable (~0.01 px cross-program). This script is the neutral
arbiter: single-example CPU-f32 forwards, no batching, HIGHEST precision.

    python examples/cpu_truth_eval.py --ckpt DIR [--workdir /tmp/overfit_proof]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--workdir", default="/tmp/overfit_proof")
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from lwsnet_tpu import LWSNet, ModelConfig, TrainConfig
    from lwsnet_tpu.data import transforms as T
    from lwsnet_tpu.data.png import read_png
    from lwsnet_tpu.training import metrics
    from lwsnet_tpu.training.checkpoint import CheckpointManager
    from lwsnet_tpu.training.state import create_train_state

    model = LWSNet(ModelConfig(compute_dtype="float32"))
    state = create_train_state(model, TrainConfig(), jax.random.PRNGKey(0),
                               (64, 128))
    restored, meta = CheckpointManager(args.ckpt).restore(state)
    assert restored is not None, args.ckpt
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))
    variables = {"params": restored.params,
                 "batch_stats": restored.batch_stats}
    epes = []
    for i in range(args.pairs):
        l = T.normalize(T.load_image(f"{args.workdir}/l_{i}.png"))[None]
        r = T.normalize(T.load_image(f"{args.workdir}/r_{i}.png"))[None]
        d = (read_png(f"{args.workdir}/d_{i}.png").astype(np.float32)
             / 256.0)[None]
        outs = fwd(variables, jnp.asarray(l), jnp.asarray(r))
        epes.append(float(metrics.epe(outs[-1][..., 0], jnp.asarray(d),
                                      192.0)))
    result = {"ckpt": args.ckpt, "ckpt_meta": {k: float(v)
                                               for k, v in meta.items()},
              "pairs": args.pairs,
              "cpu_f32_stage4_epe_px": round(float(np.mean(epes)), 3),
              "per_pair_max": round(float(np.max(epes)), 3)}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
