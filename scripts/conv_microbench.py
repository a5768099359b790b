"""Micro-benchmark: is XLA's 1-D conv lowering leaving MXU on the table?

Round 1 probed only B=32, T=224, C=512→512, k=3 (answer: 94% of the
equal-FLOP matmul roofline). The flagship UNet-XL's device time is actually
dominated by OTHER shapes — k=5 C=1024→1024 resblock convs at T ∈
{224,112,56,28}, the unaligned 526→1024 input conv, k=3 s=2 downsamples and
k=4 s=2 ConvTranspose upsamples — so `--suite unet` now sweeps the real
inventory to locate the residual ~24% MFU gap (BENCH_NOTES round 1:
96.7% of trace time is conv fusions; the gap is INSIDE them).

Per shape it compares:
  a) lax.conv_general_dilated (what nn.Conv lowers to),
  b) (stride-1 only) the same conv as k shifted matmuls (pure dot_general),
  c) a dense [BT, C] x [C, C] matmul chain of equal FLOPs as the roofline.

Each variant is scanned N times inside one jit so the program runs ≥10 s
on-device (axon relay: sub-second timings are unreliable — BENCH_NOTES.md).

Usage:
  python scripts/conv_microbench.py [--iters 2000] [--channels 512]
  python scripts/conv_microbench.py --suite unet [--iters 800]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse


def bench_shape(B, T, cin, cout, K, stride=1, transpose=False, iters=2000,
                skip_variants=False):
    """Times one conv shape; returns {variant: TFLOP/s}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, cin)), dt)
    w = jnp.asarray(rng.standard_normal((K, cin, cout)) * 0.02, dt)
    # equal-FLOP dense probe: K matmuls at the conv's (M=BT_out, cin, cout)
    t_out = T * stride if transpose else T // stride
    wd = jnp.asarray(rng.standard_normal((cin, cout)) * 0.02, dt)
    wd_back = jnp.asarray(rng.standard_normal((cout, cin)) * 0.02, dt)

    if transpose:
        def conv_lax(x, w):
            return jax.lax.conv_transpose(
                x, w, strides=(stride,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
            ).astype(dt)
    else:
        pad = K // 2

        def conv_lax(x, w):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(stride,), padding=[(pad, pad)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
            ).astype(dt)

    def conv_shifted(x, w):
        # y[t] = sum_dk x[t+dk-K//2] w[dk]  (SAME padding, stride 1)
        y = jax.lax.dot_general(
            x, w[K // 2], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for dk in range(K):
            off = dk - K // 2
            if off == 0:
                continue
            if off < 0:
                xs = jnp.pad(x[:, :off], ((0, 0), (-off, 0), (0, 0)))
            else:
                xs = jnp.pad(x[:, off:], ((0, 0), (0, off), (0, 0)))
            y += jax.lax.dot_general(
                xs, w[dk], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return y.astype(dt)

    def dense_k(x, _):
        # equal-FLOP roofline: K dense matmuls bouncing cin↔cout
        y = jax.lax.dot_general(
            x, wd, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dt)
        for i in range(1, K):
            wk = wd_back if i % 2 else wd
            y = jax.lax.dot_general(
                y, wk, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
        return y

    def timed(name, fn, x0, flops):
        import jax

        @jax.jit
        def run(x0, w):
            def body(carry, _):
                out = fn(carry, w)
                # fold the output back into a carry of x's shape so every
                # iteration depends on the previous one (no loop-invariant
                # hoisting); the reshaping is <2% of the conv's traffic
                if out.shape[1] < T:
                    reps = -(-T // out.shape[1])
                    out = jnp.concatenate([out] * reps, axis=1)
                out = out[:, :T, :cin] if out.shape[2] >= cin else jnp.pad(
                    out[:, :T], ((0, 0), (0, 0), (0, cin - out.shape[2]))
                )
                return out.astype(dt), ()

            out, extra = jax.lax.scan(body, x0, None, length=iters)
            return out, extra

        r = run(x0, w)
        jax.block_until_ready(r)  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, w))
        dt_s = time.perf_counter() - t0
        tf = flops * iters / dt_s / 1e12
        print(f"  {name:14s} {dt_s:7.2f} s  {tf:7.2f} TFLOP/s", flush=True)
        return tf

    conv_flops = 2 * B * t_out * cin * cout * K
    tag = ("convT" if transpose else "conv") + (f" s{stride}" if stride > 1 else "")
    print(f"{tag} B={B} T={T} {cin}->{cout} k={K} bf16 "
          f"({conv_flops * iters / 1e12:.1f} TFLOP/variant)", flush=True)
    out = {}
    out["lax.conv"] = timed("lax.conv", conv_lax, x, conv_flops)
    if not skip_variants:
        if stride == 1 and not transpose:
            err = float(jnp.max(jnp.abs(
                conv_lax(x, w).astype(jnp.float32)
                - conv_shifted(x, w).astype(jnp.float32)
            )))
            print(f"  shifted-matmul max |diff| vs lax.conv: {err:.3e}")
            assert err < 0.1, "shifted-matmul conv does not match lax.conv"
            out["shifted"] = timed("shifted-matmul", conv_shifted, x, conv_flops)
        # the dense chain always runs T rows (no stride), so rate it by its
        # OWN flops — the summary compares rates, not times
        out["dense"] = timed("dense-roofline", dense_k, x, 2 * B * T * cin * cout * K)
    return out


# the flagship UNet-XL (latent 512, mults 2,2,2,2, pad 224) conv inventory;
# iters scaled so every program runs >=10 s on a v5e chip
UNET_XL_SUITE = [
    # (label, B, T, cin, cout, K, stride, transpose, iters_scale)
    ("in 526ch", 64, 224, 526, 1024, 5, 1, False, 1.0),
    ("res T224", 64, 224, 1024, 1024, 5, 1, False, 1.0),
    ("res T112", 64, 112, 1024, 1024, 5, 1, False, 2.0),
    ("res T56", 64, 56, 1024, 1024, 5, 1, False, 4.0),
    ("res T28", 64, 28, 1024, 1024, 5, 1, False, 8.0),
    ("down s2 T224", 64, 224, 1024, 1024, 3, 2, False, 2.0),
    ("up T28->56", 64, 28, 1024, 1024, 4, 2, True, 4.0),
    ("up T112->224", 64, 112, 1024, 1024, 4, 2, True, 1.0),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=224)
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--in_channels", type=int, default=0,
                    help="input channels (default: --channels)")
    ap.add_argument("--kernel_size", type=int, default=3)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--transpose", action="store_true")
    ap.add_argument("--suite", choices=["unet"], default=None,
                    help="sweep the UNet-XL hot-shape inventory")
    args = ap.parse_args(argv)
    if args.iters < 1:
        ap.error("--iters must be >= 1")

    if args.suite == "unet":
        results = {}
        for label, B, T, cin, cout, K, s, tr, scale in UNET_XL_SUITE:
            print(f"[{label}]")
            results[label] = bench_shape(
                B, T, cin, cout, K, stride=s, transpose=tr,
                iters=max(1, int(args.iters * scale)),
            )
        print("\nsummary (lax.conv TFLOP/s | % of own dense roofline):")
        for label, r in results.items():
            pct = 100 * r["lax.conv"] / r["dense"] if r.get("dense") else float("nan")
            print(f"  {label:14s} {r['lax.conv']:7.1f}  {pct:5.1f}%")
        return

    bench_shape(
        args.batch, args.frames, args.in_channels or args.channels,
        args.channels, args.kernel_size, stride=args.stride,
        transpose=args.transpose, iters=args.iters,
    )


if __name__ == "__main__":
    main()
