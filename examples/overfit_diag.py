"""Overfit-dynamics microscope: whole training runs inside ONE lax.scan.

The committed OVERFIT_PROOF run (real Trainer.fit loop) plateaus at loss ~7
and drifts UP after step ~300 (r3 VERDICT "what's weak" #4). Each host-loop
step costs ~1.5 s through the device tunnel, so sweeping hypotheses that way
is hopeless. This script runs the synthetic-overfit optimization entirely
on-device — N train steps as one lax.scan over a fixed batch set — which
makes an 800-step run take seconds, and dumps per-step telemetry (total and
per-stage loss, grad norm, lr) plus a final train-vs-eval-mode EPE so BN
running-stat effects are visible.

Usage:
    python examples/overfit_diag.py --steps 800 --configs baseline f32 const_lr
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN_LEFT = "/root/reference/reference/left_test.png"
H, W = 256, 512


def build_batches(n_pairs: int, batch: int, seed: int = 0,
                  amp: float = 3.0):
    """Synthetic stereo pairs with exactly known GT (same generator as
    examples/overfit_proof.py), stacked into (NB, batch, ...) arrays."""
    from lwsnet_tpu.data import transforms as T
    from examples.overfit_proof import MARGIN, synth_pair

    src = T.load_image(GOLDEN_LEFT)
    rng = np.random.default_rng(seed)
    lefts, rights, disps = [], [], []
    for _ in range(n_pairs):
        y0 = int(rng.integers(0, src.shape[0] - H + 1))
        x0 = int(rng.integers(0, src.shape[1] - W - MARGIN + 1))
        strip = src[y0:y0 + H, x0:x0 + W + MARGIN]
        left, right, disp = synth_pair(strip, rng, amp=amp)
        lefts.append(T.normalize(left))
        rights.append(T.normalize(right))
        disps.append(disp)
    nb = n_pairs // batch
    l = np.stack(lefts).reshape(nb, batch, H, W, 3)
    r = np.stack(rights).reshape(nb, batch, H, W, 3)
    g = np.stack(disps).reshape(nb, batch, H, W)
    return l, r, g


CONFIGS = {
    # the committed OVERFIT_PROOF configuration
    "baseline": dict(dtype="bfloat16", lr=1e-3, milestones=(250, 450, 650)),
    # is bf16 compute the loss floor?
    "f32": dict(dtype="float32", lr=1e-3, milestones=(250, 450, 650)),
    # is the epoch-250 decay freezing progress?
    "const_lr": dict(dtype="bfloat16", lr=1e-3, milestones=()),
    "const_lr_f32": dict(dtype="float32", lr=1e-3, milestones=()),
    # tighter grad clip against the gnorm-explosion instability
    "clip1": dict(dtype="bfloat16", lr=1e-3, milestones=(250, 450, 650),
                  clip=1.0),
    # decay before the ~step-150 instability onset, shallower (0.3)
    "early_decay": dict(dtype="bfloat16", lr=1e-3, gamma=0.3,
                        milestones=(120, 280, 450, 620)),
    "early_decay_f32": dict(dtype="float32", lr=1e-3, gamma=0.3,
                            milestones=(120, 280, 450, 620)),
    # frozen-BN training: removes the batch-stat co-adaptation that makes
    # tiny-fixed-set training chaotically sharp (see TrainConfig.bn_mode)
    "frozen": dict(dtype="bfloat16", lr=1e-3, milestones=(250, 450, 650),
                   bn="frozen"),
    "frozen_const": dict(dtype="bfloat16", lr=1e-3, milestones=(),
                         bn="frozen"),
    # prime running stats with forward passes BEFORE freezing: frozen-at-
    # init stats leave activations unnormalized -> saturated soft-argmin ->
    # stages 1-2 get no gradient (observed: stage-1 loss pinned at its init
    # value for 800 steps)
    "primed": dict(dtype="bfloat16", lr=1e-3, milestones=(250, 450, 650),
                   bn="frozen", prime=60),
    "primed_const": dict(dtype="bfloat16", lr=1e-3, milestones=(),
                         bn="frozen", prime=60),
    # the reference's own finetune hyperparameters (lr 5e-4, one 0.1 decay
    # at 2/3 of the run; reference finetune.py:82-84), for use with a
    # diverse (>=64-pair) synthetic set where batch statistics stay healthy
    "ref_sched": dict(dtype="bfloat16", lr=5e-4, milestones=(530,)),
    "ref_sched_2k": dict(dtype="bfloat16", lr=5e-4, milestones=(1300,)),
}


def run_config(name, spec, batches, steps, out):
    import jax
    import jax.numpy as jnp

    from lwsnet_tpu import LWSNet, ModelConfig, TrainConfig
    from lwsnet_tpu.training.state import create_train_state
    from lwsnet_tpu.training.steps import make_train_step

    l, r, g = batches
    nb = l.shape[0]
    mcfg = ModelConfig(compute_dtype=spec["dtype"])
    tcfg = TrainConfig(lr=spec["lr"], train_batch_size=l.shape[1],
                       mask_min_disp=0.0,
                       lr_milestones=tuple(spec["milestones"]),
                       lr_gamma=spec.get("gamma", 0.1),
                       grad_clip_norm=spec.get("clip", 5.0),
                       bn_mode=spec.get("bn", "batch"))
    model = LWSNet(mcfg)
    # milestones are epochs; with nb batches/epoch the schedule converts
    # per-epoch to per-step exactly like the Trainer does
    state = create_train_state(model, tcfg, jax.random.PRNGKey(0), (H, W),
                               steps_per_epoch=nb)
    step = make_train_step(model, tcfg, nb, donate=False)

    lj = jnp.asarray(l, jnp.float32)
    rj = jnp.asarray(r, jnp.float32)
    gj = jnp.asarray(g, jnp.float32)

    if spec.get("prime"):
        @jax.jit
        def prime(state):
            def body(s, i):
                b = i % nb
                _, mut = model.apply(
                    {"params": s.params, "batch_stats": s.batch_stats},
                    jax.lax.dynamic_index_in_dim(lj, b, keepdims=False),
                    jax.lax.dynamic_index_in_dim(rj, b, keepdims=False),
                    train=True, mutable=["batch_stats"])
                return s.replace(batch_stats=mut["batch_stats"]), 0.0
            s, _ = jax.lax.scan(body, state, jnp.arange(spec["prime"]))
            return s

        state = prime(state)

    # Chunked scan: one giant 800-step dispatch crashed the tunnel-attached
    # TPU worker and 100-step chunks hung its RPC layer (single executions
    # beyond ~tens of seconds don't survive the transport), so run short
    # CHUNK-step scans in a host loop — still ~CHUNK x fewer round trips
    # than the per-step Trainer loop.
    CHUNK = int(os.environ.get("DIAG_CHUNK", "20"))

    @jax.jit
    def trajectory(state, start):
        def body(state, i):
            b = i % nb
            s, aux = step(state,
                          jax.lax.dynamic_index_in_dim(lj, b, keepdims=False),
                          jax.lax.dynamic_index_in_dim(rj, b, keepdims=False),
                          jax.lax.dynamic_index_in_dim(gj, b, keepdims=False))
            return s, {"loss": aux["loss"],
                       "stage": aux["stage_losses"],
                       "gnorm": aux["grad_norm"],
                       "lr": aux["lr"]}

        return jax.lax.scan(body, state, start + jnp.arange(CHUNK))

    t0 = time.time()
    tels = []
    for c in range(0, steps, CHUNK):
        state, tel_c = trajectory(state, jnp.asarray(c, jnp.int32))
        tels.append(jax.device_get(tel_c))
    final_state = state
    tel = {k: np.concatenate([t[k] for t in tels]) for k in tels[0]}
    wall = time.time() - t0

    # Final metrics in BOTH BatchNorm modes, one jitted step per batch:
    # per-stage masked smooth-L1 and stage-4 EPE with train=True (batch
    # statistics — exactly what the training loss saw) and train=False
    # (running statistics — what checkpoint eval sees). A loss/EPE pair
    # that disagrees within a mode means a metric bug; a pair that agrees
    # within each mode but differs across modes implicates the BN stats.
    from lwsnet_tpu.training import losses as L
    from lwsnet_tpu.training import metrics as M

    @jax.jit
    def dbg(state, lb, rb, gb):
        out = {}
        for tag, train in (("train", True), ("eval", False)):
            if train:
                outs, _ = model.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    lb, rb, train=True, mutable=["batch_stats"])
            else:
                outs = model.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    lb, rb, train=False)
            _, per = L.staged_loss(outs, gb, tcfg.loss_weights,
                                   min_disp=0.0)
            out[f"loss4_{tag}"] = per[-1]
            out[f"epe_{tag}"] = M.epe(outs[-1][..., 0], gb, 192.0)
        return out

    d0 = {k: round(float(np.mean([float(dbg(final_state, lj[b], rj[b],
                                            gj[b])[k]) for b in range(nb)])),
                   4)
          for k in ("loss4_train", "loss4_eval", "epe_train", "epe_eval")}

    # Post-training BN re-estimation ("precise BN"): refresh the running
    # statistics with forward passes at the final params, then re-eval.
    # Tests whether the eval-vs-train gap is an EMA-staleness artifact.
    @jax.jit
    def restat(state):
        def body(s, i):
            b = i % nb
            _, mut = model.apply(
                {"params": s.params, "batch_stats": s.batch_stats},
                jax.lax.dynamic_index_in_dim(lj, b, keepdims=False),
                jax.lax.dynamic_index_in_dim(rj, b, keepdims=False),
                train=True, mutable=["batch_stats"])
            return s.replace(batch_stats=mut["batch_stats"]), 0.0
        s, _ = jax.lax.scan(body, state, jnp.arange(4 * nb))
        return s

    re_state = restat(final_state)
    d0["epe_eval_restat"] = round(float(np.mean(
        [float(dbg(re_state, lj[b], rj[b], gj[b])["epe_eval"])
         for b in range(nb)])), 4)
    # Cross-check: the SAME train_step function applied once more to the
    # final state must agree with dbg's train-mode loss; a mismatch pins
    # the discrepancy to the computation, agreement pins it to the state.
    _, aux_chk = step(final_state, lj[0], rj[0], gj[0])
    d0["step_loss_recheck"] = round(float(aux_chk["loss"]), 4)
    d0["step_stage_recheck"] = [round(float(v), 4)
                                for v in aux_chk["stage_losses"]]
    res = {
        "config": name, **{k: (list(v) if isinstance(v, tuple) else v)
                           for k, v in spec.items()},
        "steps": steps,
        "wall_s": round(wall, 1),
        "first_loss": round(float(tel["loss"][0]), 3),
        "last_loss": round(float(tel["loss"][-1]), 4),
        "min_loss": round(float(tel["loss"].min()), 4),
        "argmin_loss": int(tel["loss"].argmin()),
        "final_epe_eval": d0["epe_eval"],
        "final_epe_train": d0["epe_train"],
        "final_loss4_eval": d0["loss4_eval"],
        "final_loss4_train": d0["loss4_train"],
        "step_loss_recheck": d0["step_loss_recheck"],
        "step_stage_recheck": d0["step_stage_recheck"],
        "epe_eval_restat": d0["epe_eval_restat"],
        "loss_last_10": [round(float(x), 3) for x in tel["loss"][-10:]],
        "max_gnorm": round(float(tel["gnorm"].max()), 2),
        "final_stage_losses": [round(float(x), 4) for x in tel["stage"][-1]],
        "loss_every_25": [round(float(x), 3) for x in tel["loss"][::25]],
        "gnorm_every_25": [round(float(x), 2) for x in tel["gnorm"][::25]],
    }
    print(json.dumps(res))
    out.append(res)
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--pairs", type=int, default=4)
    p.add_argument("--amp", type=float, default=3.0)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--configs", nargs="*", default=list(CONFIGS))
    p.add_argument("--out", default="/tmp/overfit_diag.json")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    batches = build_batches(args.pairs, args.batch, amp=args.amp)
    out = []
    for name in args.configs:
        run_config(name, CONFIGS[name], batches, args.steps, out)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
