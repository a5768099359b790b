"""Micro-benchmark: is XLA's 1-D conv lowering leaving MXU on the table?

Compares, at the UNet-XL hot shape (B=32, T=224, C=512→512, k=3):
  a) lax.conv_general_dilated (what nn.Conv lowers to),
  b) the same conv as 3 shifted matmuls (k explicit, pure dot_general),
  c) a dense [BT, C] x [C, C] matmul of equal FLOPs as the roofline probe.

Each variant is scanned N times inside one jit so the program runs ≥10 s
on-device (axon relay: sub-second timings are unreliable — BENCH_NOTES.md).

Usage: python scripts/conv_microbench.py [--iters 2000] [--channels 512]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=224)
    ap.add_argument("--channels", type=int, default=512)
    args = ap.parse_args(argv)
    if args.iters < 1:
        ap.error("--iters must be >= 1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, T, C, K = args.batch, args.frames, args.channels, 3
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), dt)
    w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.02, dt)
    wd = jnp.asarray(rng.standard_normal((C, C)) * 0.02, dt)

    def conv_lax(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        ).astype(dt)

    def conv_shifted(x, w):
        # y[t] = x[t-1] w0 + x[t] w1 + x[t+1] w2  (SAME padding)
        y = jax.lax.dot_general(
            x, w[1], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        xm = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0)))
        xp = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0)))
        y += jax.lax.dot_general(
            xm, w[0], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        y += jax.lax.dot_general(
            xp, w[2], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return y.astype(dt)

    def dense3(x, wd):
        # equal-FLOP roofline probe: 3 dense matmuls
        y = x
        for _ in range(K):
            y = jax.lax.dot_general(
                y, wd, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(dt)
        return y

    def timed(name, fn, *operands, flops):
        @jax.jit
        def run(*ops):
            def body(carry, _):
                out = fn(*([carry] + list(ops[1:])))
                return out, ()

            out, _ = jax.lax.scan(body, ops[0], None, length=args.iters)
            return out

        run(*operands).block_until_ready()  # compile
        t0 = time.perf_counter()
        run(*operands).block_until_ready()
        dt_s = time.perf_counter() - t0
        tf = flops * args.iters / dt_s / 1e12
        print(f"{name:14s} {dt_s:7.2f} s  {tf:7.2f} TFLOP/s")
        return tf

    err = float(jnp.max(jnp.abs(
        conv_lax(x, w).astype(jnp.float32) - conv_shifted(x, w).astype(jnp.float32)
    )))
    print(f"shifted-matmul max |diff| vs lax.conv: {err:.3e}")
    assert err < 0.1, "shifted-matmul conv does not match lax.conv"

    conv_flops = 2 * B * T * C * C * K
    print(f"shape B={B} T={T} C={C} k={K} bf16, {args.iters} iters "
          f"({conv_flops*args.iters/1e12:.1f} TFLOP total per variant)")
    timed("lax.conv", conv_lax, x, w, flops=conv_flops)
    timed("shifted-matmul", conv_shifted, x, w, flops=conv_flops)
    timed("dense-roofline", dense3, x, wd, flops=conv_flops)


if __name__ == "__main__":
    main()
