"""SceneFlow pretraining entry point (reference: train.py).

    python -m lwsnet_tpu.cli.pretrain --datapath dataset/sceneflow/

Multi-host: launch one process per host with JAX's coordinator env vars set;
data is sharded per host, checkpoints/logs are written by process 0 only.
"""

from __future__ import annotations

import argparse

from lwsnet_tpu.cli import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SceneFlow pretrain")
    p.add_argument("--datapath", default="dataset/sceneflow/")
    p.add_argument("--sceneflow_compat_15mm", action="store_true",
                   help="reproduce the reference's duplicated 15mm driving "
                        "split (reference: dataloader/sceneflow.py:105)")
    common.add_model_flags(p)
    common.add_data_flags(p, eval_height=544, eval_width=960)
    common.add_train_flags(p, epochs=10, batch=8,
                           save_path="results/pretrained")
    return p


def main(argv=None) -> float:
    args = build_parser().parse_args(argv)

    import jax

    from lwsnet_tpu.data.pipeline import StereoPipeline
    from lwsnet_tpu.data.sceneflow import index_sceneflow
    from lwsnet_tpu.parallel.mesh import maybe_initialize_distributed
    from lwsnet_tpu.training.loop import Trainer, TrainerConfig
    from lwsnet_tpu.utils.logger import setup_logger

    maybe_initialize_distributed()
    log = setup_logger("pretrain", "./log/", jax.process_index())
    for k, v in sorted(vars(args).items()):
        log.info("%s: %s", k, v)

    model_cfg = common.model_config(args)
    # pretrain mask: gt < maxdisp (reference: train.py:137)
    train_cfg = common.train_config(args, mask_max_disp=float(args.maxdisp))

    train_idx, test_idx = index_sceneflow(
        args.datapath, compat_duplicate_15mm=args.sceneflow_compat_15mm)
    log.info("train %d examples, test %d examples",
             len(train_idx), len(test_idx))

    pi, pc = jax.process_index(), jax.process_count()
    train_pipe = StereoPipeline(
        train_idx, args.train_batch_size, training=True,
        crop=(args.crop_height, args.crop_width),
        kitti=False, seed=args.seed, num_workers=args.num_workers,
        process_index=pi, process_count=pc)
    eval_pipe = StereoPipeline(
        test_idx, args.test_batch_size, training=False,
        crop=(args.eval_height, args.eval_width),
        kitti=False, process_index=pi, process_count=pc)

    trainer = Trainer(
        TrainerConfig(model=model_cfg, train=train_cfg, eval_metric="epe",
                      sceneflow_row_offset=4),
        train_pipe, eval_pipe, log)
    trainer.init_state(args.seed)
    if args.resume:
        trainer.resume()
    return trainer.fit()


if __name__ == "__main__":
    main()
