"""Per-component device timing of the 4-stage forward at 368x1232.

Times the production (Pallas) inference path and the XLA module path at
num_stages=1..4 (incremental stage costs) plus the isolated hot ops from
SURVEY.md §3.5, using the dispatch-cancelling `device_time` harness. Run on
the real TPU.

    python examples/profile_forward.py [--trace /tmp/lwsnet_trace]

--trace additionally captures a `jax.profiler` trace of one warm production
forward (view with TensorBoard / Perfetto; the per-stage `jax.named_scope`
annotations in `make_forward` group the ops by cascade stage).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--trace", type=str, default="",
                   help="directory for a jax.profiler trace of the "
                        "production forward")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from lwsnet_tpu import LWSNet, ModelConfig
    from lwsnet_tpu.inference import make_forward
    from lwsnet_tpu.models.blocks import CostFilter3D
    from lwsnet_tpu.models.feature import FeatureExtractor
    from lwsnet_tpu.ops import stereo
    from lwsnet_tpu.utils.timing import device_time

    cfg = ModelConfig()
    model = LWSNet(cfg)
    h, w = 368, 1232
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), left, right, train=False)

    def t(fn, *args, iters=10):
        return device_time(fn, *args, iters=iters) * 1e3  # ms

    prev = 0.0
    for k in range(1, 5):
        fwd = make_forward(model, num_stages=k)
        ms = t(lambda l, r, fwd=fwd: fwd(variables, l, r), left, right)
        print(f"pallas forward stages=1..{k}: {ms:8.3f} ms  "
              f"(+{ms - prev:7.3f})")
        prev = ms

    if args.trace:
        fwd4 = jax.jit(make_forward(model, num_stages=4))
        jax.block_until_ready(fwd4(variables, left, right))  # warm
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(fwd4(variables, left, right))
        print(f"wrote jax.profiler trace to {args.trace}")

    prev = 0.0
    for k in range(1, 5):
        ms = t(lambda l, r, k=k: model.apply(variables, l, r, train=False,
                                             num_stages=k), left, right)
        print(f"xla    forward stages=1..{k}: {ms:8.3f} ms  "
              f"(+{ms - prev:7.3f})")
        prev = ms

    # Isolated components ---------------------------------------------------
    fe = FeatureExtractor(cfg.feature_channels, dtype=cfg.dtype)
    both = jnp.concatenate([left, right], 0).astype(cfg.dtype)
    fe_vars = jax.jit(fe.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), both, train=False)
    ms = t(lambda x: fe.apply(fe_vars, x, train=False), both)
    print(f"feature extraction (2B batch): {ms:8.3f} ms")

    feats = jax.jit(lambda x: fe.apply(fe_vars, x, train=False))(both)
    for scale, D in enumerate(cfg.max_disp_list):
        fl, fr = feats[scale][:1], feats[scale][1:]
        fh, fw, fc = fl.shape[1], fl.shape[2], fl.shape[3]
        if scale == 0:
            ms = t(lambda a, b: stereo.build_cost_volume(a, b, D), fl, fr)
            print(f"scale{scale} full volume   ({fh}x{fw}x{fc}, D={D}):"
                  f" {ms:8.3f} ms")
            nd = D
        else:
            disp = jnp.zeros((1, fh, fw), jnp.float32) + 3.0
            ms = t(lambda a, b: stereo.build_residual_volume(a, b, disp, D),
                   fl, fr)
            print(f"scale{scale} resid volume  ({fh}x{fw}x{fc}, D={D}):"
                  f" {ms:8.3f} ms")
            nd = 2 * D - 1
        vol = jnp.zeros((1, fh, fw, nd), cfg.dtype)
        filt = CostFilter3D(cfg.layers_3d,
                            cfg.channels_3d * cfg.growth_rate[scale],
                            dtype=cfg.dtype)
        fv = jax.jit(filt.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), vol, train=False)
        ms = t(lambda v: filt.apply(fv, v, train=False), vol)
        print(f"scale{scale} 3D filter     (D={nd}, {fh}x{fw},"
              f" C={cfg.channels_3d * cfg.growth_rate[scale]}): {ms:8.3f} ms")

    # Refinement towers
    from lwsnet_tpu.models.refinement import RefinementHead, RefinementTower
    tower = RefinementTower(cfg.refine_channels, dtype=cfg.dtype)
    tv = jax.jit(tower.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), left.astype(cfg.dtype), train=False)
    ms = t(lambda x: tower.apply(tv, x, train=False), left.astype(cfg.dtype))
    print(f"refinement tower (RGB, full res): {ms:8.3f} ms")
    dfull = jnp.zeros((1, h, w, 1), cfg.dtype)
    tv1 = jax.jit(tower.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), dfull, train=False)
    ms = t(lambda x: tower.apply(tv1, x, train=False), dfull)
    print(f"refinement tower (disp, full res): {ms:8.3f} ms")
    head = RefinementHead(cfg.refine_channels, dtype=cfg.dtype)
    cat = jnp.zeros((1, h, w, 2 * cfg.refine_channels), cfg.dtype)
    hv = jax.jit(head.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), cat, train=False)
    ms = t(lambda x: head.apply(hv, x, train=False), cat)
    print(f"refinement head (full res): {ms:8.3f} ms")


if __name__ == "__main__":
    main()
