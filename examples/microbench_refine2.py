"""Microbenchmark round 2: dense dilated conv + tiny-channel conv variants."""

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
        p = dil if dil > 1 else (k.shape[0] // 2)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(p, p), (p, p)], rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_shiftmm(x, k, dil):
        """Dense dilated 3x3 = sum of 9 shifted 1x1 matmuls (lax.dot)."""
        B, Hh, Ww, Ci = x.shape
        Co = k.shape[-1]
        xp = jnp.pad(x, ((0, 0), (dil, dil), (dil, dil), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.dynamic_slice(
                    xp, (0, dy * dil, dx * dil, 0), (B, Hh, Ww, Ci))
                term = jax.lax.dot_general(
                    sl, k[dy, dx], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = term if out is None else out + term
        return out.astype(x.dtype)

    def conv_s2b(x, k, dil):
        """Dense dilated 3x3 via space-to-batch + undilated conv."""
        B, Hh, Ww, Ci = x.shape
        # pad so H,W divisible by dil (here they are: 368%8==0, 1232%8==0)
        assert Hh % dil == 0 and Ww % dil == 0
        xs = x.reshape(B, Hh // dil, dil, Ww // dil, dil, Ci)
        xs = jnp.transpose(xs, (0, 2, 4, 1, 3, 5)).reshape(
            B * dil * dil, Hh // dil, Ww // dil, Ci)
        y = conv(xs, k, 1)
        Co = k.shape[-1]
        y = y.reshape(B, dil, dil, Hh // dil, Ww // dil, Co)
        return jnp.transpose(y, (0, 3, 1, 4, 2, 5)).reshape(B, Hh, Ww, Co)

    # correctness
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)), jnp.float32)
    for d in (2, 8):
        a = np.asarray(jax.jit(lambda x, k: conv(x, k, d))(x, k))
        b = np.asarray(jax.jit(lambda x, k: conv_shiftmm(x, k, d))(x, k))
        c = np.asarray(jax.jit(lambda x, k: conv_s2b(x, k, d))(x, k))
        assert np.abs(a - b).max() < 0.3, (d, np.abs(a - b).max())
        assert np.abs(a - c).max() < 0.3, (d, np.abs(a - c).max())
    print("dense dilated variants agree (bf16-pass tolerance)")

    x64 = jnp.asarray(rng.standard_normal((1, H, W, 64)), jnp.bfloat16)
    k64_32 = jnp.asarray(rng.standard_normal((3, 3, 64, 32)) * .1, jnp.bfloat16)
    for d in (2, 8):
        print(f"dense 64->32 d={d}:"
              f" conv={t(lambda a, d=d: conv(a, k64_32, d), x64):7.3f}"
              f" shiftmm={t(lambda a, d=d: conv_shiftmm(a, k64_32, d), x64):7.3f}"
              f" s2b={t(lambda a, d=d: conv_s2b(a, k64_32, d), x64):7.3f} ms")

    # tiny input channels: 3->32 full res
    x3 = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.bfloat16)
    k3_32 = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * .1, jnp.bfloat16)
    print(f"3->32 conv:    {t(lambda a: conv(a, k3_32, 1), x3):7.3f} ms")
    x8 = jnp.pad(x3, ((0, 0), (0, 0), (0, 0), (0, 5)))
    k8_32 = jnp.pad(k3_32, ((0, 0), (0, 0), (0, 5), (0, 0)))
    print(f"3->32 pad8:    {t(lambda a: conv(a, k8_32, 1), x8):7.3f} ms")
    print(f"3->32 shiftmm: {t(lambda a: conv_shiftmm(a, k3_32, 1), x3):7.3f} ms")
    x1 = jnp.asarray(rng.standard_normal((1, H, W, 1)), jnp.bfloat16)
    k1_32 = jnp.asarray(rng.standard_normal((3, 3, 1, 32)) * .1, jnp.bfloat16)
    print(f"1->32 conv:    {t(lambda a: conv(a, k1_32, 1), x1):7.3f} ms")
    print(f"1->32 shiftmm: {t(lambda a: conv_shiftmm(a, k1_32, 1), x1):7.3f} ms")
    # final head conv 32->1
    x32 = jnp.asarray(rng.standard_normal((1, H, W, 32)), jnp.bfloat16)
    k32_1 = jnp.asarray(rng.standard_normal((3, 3, 32, 1)) * .1, jnp.bfloat16)
    print(f"32->1 conv:    {t(lambda a: conv(a, k32_1, 1), x32):7.3f} ms")
    print(f"32->1 shiftmm: {t(lambda a: conv_shiftmm(a, k32_1, 1), x32):7.3f} ms")


if __name__ == "__main__":
    main()
