"""Trustworthy on-device timing over high-latency device transports.

The TPU can sit behind a high-RTT tunnel where (a) each dispatch costs
~100 ms round trip and (b) `block_until_ready` does not reliably wait for
device completion. Naive wall-clock loops measure dispatch latency, or
nothing at all.

`device_time` instead runs the op N times *inside one jitted fori_loop* (one
dispatch, N sequential device executions), forces a host fetch of a scalar
that depends on every iteration's full output, and differences two iteration
counts to cancel the fixed dispatch/fetch overhead:

    t_per_iter = (t(2N) - t(N)) / N

The loop body perturbs the input with the iteration index so XLA cannot hoist
the loop-invariant computation out of the loop, and folds the output into a
scalar accumulator so nothing is dead code.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _make_looped(fn: Callable, n: int):
    @jax.jit
    def looped(*args):
        first = args[0]

        def body(i, carry):
            x, acc = carry
            # index-dependent perturbation prevents loop-invariant hoisting
            eps = (i.astype(first.dtype) * jnp.asarray(1e-30, first.dtype))
            out = fn(x + eps, *args[1:])
            leaves = jax.tree.leaves(out)
            # Reduce the FULL output: accumulating only a slice lets XLA
            # dead-code-eliminate the unused output channels of convs and
            # matmuls (observed: a 1x1 conv timed as 0 ms under a [..., :1]
            # accumulator). The full reduction adds one read of the output
            # (~bandwidth/2765 GB/s per iteration) — negligible at ms scale,
            # a measurable floor for sub-50us ops.
            acc = acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return x, acc

        _, acc = jax.lax.fori_loop(
            0, n, body, (first, jnp.zeros((), jnp.float32)))
        return acc

    return looped


def device_time(fn: Callable, *args, iters: int = 10,
                warmup: bool = True, two_point: bool = True,
                repeats: int = 3) -> float:
    """Estimate per-call device seconds for fn(*args). The first positional
    arg must be an array (it gets the anti-hoisting perturbation).

    two_point=True compiles loops of N and 2N iterations and differences
    them (cancels dispatch/fetch overhead exactly, two compiles).
    two_point=False compiles one N-iteration loop and divides (one compile;
    overhead inflates the result by ~RTT/N — use a larger N).

    The measurement repeats `repeats` times and takes the MINIMUM of each
    loop's wall time SEPARATELY before differencing: host-side scheduling
    stalls (a loaded host, a GC pause) land in one wall-clock sample and
    poison it high — observed as a 26x-slow reading while a CPU sweep
    saturated the host — but never make a sample too FAST, so per-loop
    minima are the robust estimators. (Taking the min of the per-repeat
    DIFFERENCES t2 - t1 instead is wrong: one inflated t1 makes that
    repeat's difference spuriously SMALL and the min keeps it — the round-3
    bench reported a 2-stage program faster than the 1-stage program it
    strictly contains through exactly this path.)"""
    f1 = _make_looped(fn, iters)
    if not two_point:
        if warmup:
            float(f1(*args))
        best = float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            float(f1(*args))
            best = min(best, time.perf_counter() - t0)
        return max(best / iters, 1e-9)
    f2 = _make_looped(fn, 2 * iters)
    if warmup:
        float(f1(*args))
        float(f2(*args))
    best1 = best2 = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        float(f1(*args))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f2(*args))
        best2 = min(best2, time.perf_counter() - t0)
    return max((best2 - best1) / iters, 1e-9)
