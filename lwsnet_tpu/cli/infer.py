"""Batch / single-pair inference entry point (reference: inference.py).

    # batch mode over a KITTI testing dir:
    python -m lwsnet_tpu.cli.infer --img_path dataset/kitti2015/testing/ \
        --model results/finetune

    # single pair (expects sibling right_test.png, like the reference):
    python -m lwsnet_tpu.cli.infer --left_img reference/left_test.png \
        --model results/finetune

Saves JET-colormapped PNGs for ALL stages in both modes (the reference's
batch mode only saved the final stage — a conscious fix, SURVEY.md §7).
`--random_weights` runs with freshly initialized params (smoke/benchmarks).
"""

from __future__ import annotations

import argparse
import os

from lwsnet_tpu.cli import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Model inference")
    p.add_argument("--img_path", type=str, default="dataset/kitti2015/testing/")
    p.add_argument("--left_img", type=str, default="")
    p.add_argument("--model", type=str, default="results/finetune",
                   help="checkpoint directory")
    p.add_argument("--save_path", type=str, default="results/inference")
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--eval_height", type=int, default=368,
                   help="inference window (bottom-right crop, reference: "
                        "inference.py:93-100)")
    p.add_argument("--eval_width", type=int, default=1232)
    common.add_model_flags(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    from lwsnet_tpu.data.kitti2015 import index_kitti2015_testing
    from lwsnet_tpu.inference import InferenceEngine, save_disparity_png
    from lwsnet_tpu.models.lwsnet import LWSNet
    from lwsnet_tpu.training.checkpoint import CheckpointManager
    from lwsnet_tpu.training.state import create_train_state
    from lwsnet_tpu.config import TrainConfig
    from lwsnet_tpu.utils.logger import setup_logger

    log = setup_logger("inference", "./log/")
    for k, v in sorted(vars(args).items()):
        log.info("%s: %s", k, v)

    model_cfg = common.model_config(args)
    model = LWSNet(model_cfg)
    template = create_train_state(model, TrainConfig(), jax.random.PRNGKey(0),
                                  (64, 128))
    if args.random_weights:
        state = template
        log.info("using randomly initialized weights")
    else:
        state = CheckpointManager(args.model).restore_params_only(template)
        if state is None:
            raise SystemExit(f"no checkpoint found in {args.model}")
        log.info("loaded checkpoint from %s", args.model)

    engine = InferenceEngine(model_cfg, state.variables,
                             eval_height=args.eval_height,
                             eval_width=args.eval_width)

    if args.left_img:
        # single-pair: sibling right_test.png, outputs <stage>.png next to it
        # (reference: inference.py:66-70, 117-122)
        left = args.left_img
        right = os.path.join(os.path.dirname(args.left_img), "right_test.png")
        out_dir = args.save_path or os.path.dirname(args.left_img)
        os.makedirs(out_dir, exist_ok=True)
        disps, dt = engine.infer_files(left, right,
                                       num_stages=model_cfg.num_stages)
        log.info("Inference %d stages cost = %.3f sec, FPS = %.1f",
                 len(disps), dt, 1.0 / dt)
        for s, d in enumerate(disps):
            path = os.path.join(out_dir, f"{s + 1}.png")
            save_disparity_png(path, d)
            log.info("Save img = %s", path)
        return

    index = index_kitti2015_testing(args.img_path)
    os.makedirs(args.save_path, exist_ok=True)
    for i in range(len(index)):
        name = os.path.splitext(os.path.basename(index.left[i]))[0]
        disps, dt = engine.infer_files(index.left[i], index.right[i],
                                       num_stages=model_cfg.num_stages)
        log.info("[%d/%d] %s: %.3f sec (%.1f FPS)",
                 i + 1, len(index), name, dt, 1.0 / dt)
        for s, d in enumerate(disps):
            save_disparity_png(
                os.path.join(args.save_path, f"{name}_stage{s + 1}.png"), d)


if __name__ == "__main__":
    main()
