"""Measure the fused Pallas resblock kernel vs XLA at the UNet-XL hot shapes.

Round-3 VERDICT #4: one more swing at bf16 ≥20× on the flagship. The trace
says the residual MFU gap lives in the downsampled-stage convs (T=56/28)
and the GroupNorm/AdaGN chains between them; ops/resblock.py fuses a whole
Conv1d(AdaGN)Block half into one VMEM residency with full-width MXU
matmuls. This script times both paths on the real chip (scan ≥10 s per
variant — axon relay floor) and prints a per-shape speedup table for
BENCH_NOTES; the kernel is only wired into the model if it WINS here.

Usage: python scripts/resblock_microbench.py [--iters 400] [--shapes 56,28]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(B, T, C, k, iters, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from condmdi_tpu.ops.resblock import (
        fused_conv_gn_mish, reference_conv_gn_mish, supports,
    )

    assert supports(B, T, C, C, k, 8)
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), dt)
    w = jnp.asarray(rng.standard_normal((k, C, C)) * 0.02, dt)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, dt)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal((C,)), dt)
    beta = jnp.asarray(0.1 * rng.standard_normal((C,)), dt)
    scale = jnp.asarray(0.2 * rng.standard_normal((B, C)), dt)
    shift = jnp.asarray(0.2 * rng.standard_normal((B, C)), dt)

    def xla_block(x):
        return reference_conv_gn_mish(
            x, w, b, gamma, beta, scale=scale, shift=shift, n_groups=8
        )

    def fused_block(x):
        return fused_conv_gn_mish(
            x, w, b, gamma, beta, scale=scale, shift=shift, n_groups=8
        )

    # parity first (bf16 MXU tolerance)
    d = float(jnp.max(jnp.abs(
        xla_block(x).astype(jnp.float32) - fused_block(x).astype(jnp.float32)
    )))
    print(f"  max |xla - fused| = {d:.3e}")

    flops = 2 * B * T * C * C * k

    def timed(name, fn):
        @jax.jit
        def run(x0):
            def body(carry, _):
                return fn(carry).astype(dt), ()

            out, _ = jax.lax.scan(body, x0, None, length=iters)
            return out

        jax.block_until_ready(run(x))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        dt_s = time.perf_counter() - t0
        tf = flops * iters / dt_s / 1e12
        print(f"  {name:10s} {dt_s:7.2f} s  {tf:7.2f} TFLOP/s", flush=True)
        return tf

    print(f"resblock-half B={B} T={T} C={C} k={k} {dtype} "
          f"({flops * iters / 1e12:.1f} TFLOP/variant)", flush=True)
    r_xla = timed("xla", xla_block)
    r_fused = timed("fused", fused_block)
    print(f"  speedup fused/xla = {r_fused / r_xla:.3f}")
    return {"xla": r_xla, "fused": r_fused, "max_diff": d}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--kernel_size", type=int, default=5)
    ap.add_argument("--shapes", default="56,28",
                    help="comma-separated frame counts")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)

    results = {}
    for T in [int(s) for s in args.shapes.split(",")]:
        # scale iters so each program stays >=10 s at lower T
        it = max(1, int(args.iters * 56 / T))
        results[T] = bench(
            args.batch, T, args.channels, args.kernel_size, it, args.dtype
        )
    print("\nsummary:")
    for T, r in results.items():
        print(f"  T={T:4d}  xla {r['xla']:7.1f}  fused {r['fused']:7.1f} "
              f"TFLOP/s  ({r['fused'] / r['xla']:.2f}x)")


if __name__ == "__main__":
    main()
