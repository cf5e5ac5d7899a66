"""Microbenchmark: candidate TPU formulations of the 3D cost-filter conv.

Compares, per stage shape, a single mid-layer 3x3x3 conv (Cin=Cout=C):
  a) xla3d      — lax 3-spatial-dim conv (current path)
  b) folded     — fold D into channels; one 2D conv with a block-banded
                  (3,3,D*C,D*C) weight built from the true (3,3,3,C,C) kernel
  c) kdbatch    — fold D into batch; one 2D conv with kernel concat over kd
                  giving (3,3,C,3C), then shift-add along D

All three compute the SAME math (padding=1 along D). Verifies allclose on a
small shape first, then times each on the big shapes.
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

    def conv3d(x, k):  # x (B,D,H,W,C), k (3,3,3,Ci,Co)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def folded(x, k):
        B, D, H, W, C = x.shape
        Co = k.shape[-1]
        # banded weight: W2[kh,kw, di*C+ci, do*Co+co] = k[di-do+1,kh,kw,ci,co]
        eyes = [jnp.eye(D, k=1 - kd, dtype=k.dtype) for kd in range(3)]
        W2 = sum(jnp.einsum("pq,hwio->hwpiqo", eyes[kd], k[kd])
                 for kd in range(3))
        W2 = W2.reshape(3, 3, D * C, D * Co)
        xf = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H, W, D * C)
        y = jax.lax.conv_general_dilated(
            xf, W2, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.transpose(y.reshape(B, H, W, D, Co), (0, 3, 1, 2, 4))

    def kdbatch(x, k):
        B, D, H, W, C = x.shape
        Co = k.shape[-1]
        kc = jnp.concatenate([k[0], k[1], k[2]], axis=-1)  # (3,3,Ci,3Co)
        y = jax.lax.conv_general_dilated(
            x.reshape(B * D, H, W, C), kc, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(B, D, H, W, 3, Co)
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
        # out[d] = y0[d-1] + y1[d] + y2[d+1]
        return (yp[:, :D, :, :, 0] + yp[:, 1:D + 1, :, :, 1]
                + yp[:, 2:, :, :, 2])

    impls = {"xla3d": conv3d, "folded": folded, "kdbatch": kdbatch}

    # correctness on small shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 8, 16, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 4)), jnp.float32)
    ref = np.asarray(conv3d(x, k))
    for name, fn in impls.items():
        got = np.asarray(jax.jit(fn)(x, k))
        err = np.abs(got - ref).max()
        print(f"{name}: max |err| = {err:.2e}")
        assert err < 1e-3, name

    # timing on real stage shapes (bf16, B=1)
    shapes = [("stage1 mid", (1, 24, 46, 154, 32)),
              ("stage2 mid", (1, 9, 92, 308, 8)),
              ("stage3 mid", (1, 9, 184, 616, 8))]
    for label, shp in shapes:
        B, D, H, W, C = shp
        x = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.1,
                        jnp.bfloat16)
        row = [label]
        for name, fn in impls.items():
            ms = device_time(lambda a, kk=k, f=fn: f(a, kk), x, iters=20) * 1e3
            row.append(f"{name}={ms:7.3f}ms")
        print("  ".join(row))


if __name__ == "__main__":
    main()
