"""Golden-pair smoke test: run the 4-stage cascade on the reference's
committed KITTI stereo pair and write JET-colormapped PNGs per stage —
the same manual regression check the reference documents
(reference: README.md:119-129, inference.py:66-70).

    python examples/golden_pair_inference.py [--ckpt results/finetune] \
        [--pdparams weights.pdparams] [--out /tmp/golden_out]

--pdparams loads the reference's released Paddle weights through
`lwsnet_tpu.convert` — with them the stage PNGs should reproduce
reference/{1..4}.png. Without weights it runs random init (exercises the
full pipeline; outputs are noise but shapes/finiteness are checked).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
import sys

import numpy as np

GOLDEN_DIR = "/root/reference/reference"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--pdparams", type=str, default="",
                   help="reference .pdparams checkpoint to convert and load")
    p.add_argument("--out", type=str, default="/tmp/golden_out")
    p.add_argument("--left", type=str,
                   default=os.path.join(GOLDEN_DIR, "left_test.png"))
    p.add_argument("--right", type=str,
                   default=os.path.join(GOLDEN_DIR, "right_test.png"))
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from lwsnet_tpu import LWSNet, ModelConfig, TrainConfig
    from lwsnet_tpu.inference import InferenceEngine, save_disparity_png
    from lwsnet_tpu.training.checkpoint import CheckpointManager
    from lwsnet_tpu.training.state import create_train_state

    cfg = ModelConfig()
    model = LWSNet(cfg)
    if args.pdparams:
        from lwsnet_tpu.convert import load_reference_checkpoint
        variables = load_reference_checkpoint(args.pdparams)
    else:
        state = create_train_state(model, TrainConfig(),
                                   jax.random.PRNGKey(0), (64, 128))
        if args.ckpt:
            state = CheckpointManager(args.ckpt).restore_params_only(state)
            assert state is not None, f"no checkpoint in {args.ckpt}"
        variables = state.variables

    engine = InferenceEngine(cfg, variables)
    disps, dt = engine.infer_files(args.left, args.right)
    print(f"4-stage inference: {dt * 1000:.1f} ms (timed per-dispatch; see "
          "bench.py for the trustworthy number)")

    os.makedirs(args.out, exist_ok=True)
    ok = True
    for s, d in enumerate(disps):
        finite = bool(np.isfinite(d).all())
        ok &= finite
        print(f"stage {s + 1}: shape={d.shape} "
              f"range=[{d.min():.2f}, {d.max():.2f}] finite={finite}")
        save_disparity_png(os.path.join(args.out, f"{s + 1}.png"), d)
    print(f"wrote {len(disps)} stage PNGs to {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
