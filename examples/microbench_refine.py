"""Microbenchmark: stage-4 refinement building blocks at full res (368x1232).

Finds where the ~11.8 ms refinement stage goes and tests faster formulations
for the dilated depthwise convs (XLA conv vs explicit 9-tap shift-add on the
VPU) and the 3x3 convs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lwsnet_tpu.utils.timing import device_time

    H, W = 368, 1232
    rng = np.random.default_rng(0)

    def t(fn, *args, iters=20):
        return device_time(fn, *args, iters=iters) * 1e3

    def conv(x, k, dil=1):
        p = dil
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(p, p), (p, p)], rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dwconv(x, k, dil=1):  # k (3,3,1,C)
        p = dil
        C = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(p, p), (p, p)], rhs_dilation=(dil, dil),
            feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dw_shiftadd(x, k, dil=1):  # k (3,3,1,C) -> 9 shifted FMAs
        B, Hh, Ww, C = x.shape
        xp = jnp.pad(x, ((0, 0), (dil, dil), (dil, dil), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.dynamic_slice(
                    xp, (0, dy * dil, dx * dil, 0), (B, Hh, Ww, C))
                term = sl * k[dy, dx, 0]
                out = term if out is None else out + term
        return out

    # correctness of shift-add vs conv
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 8)), jnp.float32)
    for d in (1, 2, 16):
        a = np.asarray(jax.jit(lambda x, k: dwconv(x, k, d))(x, k))
        b = np.asarray(jax.jit(lambda x, k: dw_shiftadd(x, k, d))(x, k))
        assert np.abs(a - b).max() < 1e-1, (d, np.abs(a - b).max())  # TPU conv runs bf16 passes
    print("dw shift-add == dw conv: ok")

    x32 = jnp.asarray(rng.standard_normal((1, H, W, 32)), jnp.bfloat16)
    x64 = jnp.asarray(rng.standard_normal((1, H, W, 64)), jnp.bfloat16)
    x3 = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.bfloat16)
    k33_3_32 = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * .1, jnp.bfloat16)
    k33_32_32 = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * .1, jnp.bfloat16)
    k33_64_32 = jnp.asarray(rng.standard_normal((3, 3, 64, 32)) * .1, jnp.bfloat16)
    kdw32 = jnp.asarray(rng.standard_normal((3, 3, 1, 32)) * .1, jnp.bfloat16)
    k11_32_32 = jnp.asarray(rng.standard_normal((1, 1, 32, 32)) * .1, jnp.bfloat16)

    print(f"conv3x3 3->32:   {t(lambda a: conv(a, k33_3_32), x3):7.3f} ms")
    print(f"conv3x3 32->32:  {t(lambda a: conv(a, k33_32_32), x32):7.3f} ms")
    print(f"conv3x3 64->32 d8: {t(lambda a: conv(a, k33_64_32, 8), x64):7.3f} ms")
    print(f"conv1x1 32->32:  {t(lambda a: conv(a, k11_32_32), x32):7.3f} ms")
    for d in (2, 4, 8, 16):
        ms_c = t(lambda a: dwconv(a, kdw32, d), x32)
        ms_s = t(lambda a: dw_shiftadd(a, kdw32, d), x32)
        print(f"dw3x3 d={d:2d}: conv={ms_c:7.3f} ms  shiftadd={ms_s:7.3f} ms")
    # fused dw + pointwise chain (as in PreConvDW)
    ms = t(lambda a: conv(dw_shiftadd(a, kdw32, 8), k11_32_32), x32)
    print(f"dw(shiftadd,d8)+1x1: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
