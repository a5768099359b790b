"""Per-stage conv roofline for the flagship UNet-XL sampling step.

VERDICT r3 #4 decision datum: the residual bf16 MFU gap lives in the
downsampled-T stages (BENCH_NOTES trace: 96.7% of device time is conv
fusions; T=56/28 tiles underfill the MXU). Before writing a fused Pallas
resblock, measure what each conv SHAPE can actually sustain:

  * every distinct conv shape of the UNet-XL forward (B=64, T=224 pad,
    keyframe-concat 526 input channels), with its occurrence count;
  * for the low-T stages, an equal-FLOP dense-matmul probe — the ceiling
    ANY kernel (Pallas included) could reach at that shape.

Output: per-shape TFLOP/s table + the conv-only bound on end-to-end
samples/s/chip. If the bound is below the 20× target (5.56 samples/s),
no conv-kernel rewrite can close the gap and the int8 headline stands on
documented ground; if above, the table names the stages worth fusing.

Usage: python scripts/unet_roofline.py [--batch 64] [--target_secs 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BF16_PEAK_TFLOPS = 197.0  # v5e
BASELINE_SAMPLES_PER_SEC = 0.2778  # reference A100 (BENCH_NOTES)

# (label, T_in, Cin, Cout, k, stride, transpose, count) — mirrors
# TemporalUnet.__call__ (models/unet.py:276-357) at dim 512, mults (2,2,2,2)
SHAPES = [
    ("in526_k5_T224", 224, 526, 1024, 5, 1, False, 1),
    ("res_k5_T224",   224, 1024, 1024, 5, 1, False, 4),
    ("skip1x1_T224",  224, 526, 1024, 1, 1, False, 1),
    ("down_s2_T224",  224, 1024, 1024, 3, 2, False, 1),
    ("res_k5_T112",   112, 1024, 1024, 5, 1, False, 7),
    ("cat_k5_T112",   112, 2048, 1024, 5, 1, False, 1),
    ("cat1x1_T112",   112, 2048, 1024, 1, 1, False, 1),
    ("down_s2_T112",  112, 1024, 1024, 3, 2, False, 1),
    ("res_k5_T56",    56, 1024, 1024, 5, 1, False, 7),
    ("cat_k5_T56",    56, 2048, 1024, 5, 1, False, 1),
    ("cat1x1_T56",    56, 2048, 1024, 1, 1, False, 1),
    ("down_s2_T56",   56, 1024, 1024, 3, 2, False, 1),
    ("res_k5_T28",    28, 1024, 1024, 5, 1, False, 11),
    ("cat_k5_T28",    28, 2048, 1024, 5, 1, False, 1),
    ("cat1x1_T28",    28, 2048, 1024, 1, 1, False, 1),
    ("up_t4_T28",     28, 1024, 1024, 4, 2, True, 1),
    ("up_t4_T56",     56, 1024, 1024, 4, 2, True, 1),
    ("up_t4_T112",    112, 1024, 1024, 4, 2, True, 1),
    ("out1x1_T224",   224, 1024, 526, 1, 1, False, 1),
]
DENSE_PROBES = ("res_k5_T28", "res_k5_T56", "cat_k5_T28")


def shape_flops(B, T, Cin, Cout, k, stride, transpose):
    T_out = T * 2 if transpose else T // stride
    taps = (k // stride) if transpose else k
    return 2 * B * T_out * Cin * Cout * taps, T_out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--target_secs", type=float, default=10.0,
                    help="min on-device seconds per measurement (axon floor)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def timed_scan(fn, x, w, iters, flops):
        @jax.jit
        def run(x, w):
            def body(carry, _):
                return fn(carry, w), ()

            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out

        run(x, w).block_until_ready()
        t0 = time.perf_counter()
        run(x, w).block_until_ready()
        el = time.perf_counter() - t0
        return flops * iters / el / 1e12, el

    results = []
    for label, T, Cin, Cout, k, stride, transpose, count in SHAPES:
        flops, T_out = shape_flops(B, T, Cin, Cout, k, stride, transpose)
        x = jnp.asarray(rng.standard_normal((B, T, Cin)), dt)

        if transpose:
            w = jnp.asarray(rng.standard_normal((k, Cout, Cin)) * 0.02, dt)

            def fn(x, w, stride=stride, Cin=Cin, Cout=Cout):
                y = jax.lax.conv_transpose(
                    x, jnp.transpose(w, (0, 2, 1)), strides=(stride,),
                    padding="SAME", dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=jnp.float32,
                )
                # scan carry must keep the input shape: fold T back down
                return y.reshape(x.shape[0], x.shape[1], 2, -1)[:, :, 0, :Cin].astype(dt)
        else:
            w = jnp.asarray(rng.standard_normal((k, Cin, Cout)) * 0.02, dt)
            pad = (k // 2, k // 2) if stride == 1 else (1, 1)

            def fn(x, w, stride=stride, pad=pad, Cin=Cin):
                y = jax.lax.conv_general_dilated(
                    x, w, window_strides=(stride,), padding=[pad],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=jnp.float32,
                )
                # keep carry shape static across iters
                if y.shape[1] != x.shape[1] or y.shape[2] != Cin:
                    y = jnp.broadcast_to(
                        y[:, :1, :1], (x.shape[0], x.shape[1], Cin)
                    ) + jnp.zeros((x.shape[0], x.shape[1], Cin), jnp.float32)
                return y.astype(dt)

        iters = max(8, int(args.target_secs * 120e12 / flops))
        tput, el = timed_scan(fn, x, w, iters, flops)
        results.append(dict(
            label=label, T=T, Cin=Cin, Cout=Cout, k=k, stride=stride,
            transpose=transpose, count=count, flops=flops,
            tflops=round(tput, 2), pct_peak=round(100 * tput / BF16_PEAK_TFLOPS, 1),
            meas_secs=round(el, 1),
        ))
        print(f"{label:14s} x{count:2d}  {flops/1e9:7.2f} GFLOP  "
              f"{tput:7.1f} TF/s ({results[-1]['pct_peak']:4.1f}% peak)")

        if label in DENSE_PROBES:
            wd = jnp.asarray(rng.standard_normal((Cin, Cin)) * 0.02, dt)
            n_mm = max(1, k)  # equal-FLOP chain of dense matmuls

            def dfn(x, wd, n=n_mm):
                y = x
                for _ in range(n):
                    y = jax.lax.dot_general(
                        y, wd, (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(dt)
                return y

            dflops = 2 * B * T * Cin * Cin * n_mm
            diters = max(8, int(args.target_secs * 120e12 / dflops))
            dtput, _ = timed_scan(dfn, x, wd, diters, dflops)
            results[-1]["dense_probe_tflops"] = round(dtput, 2)
            print(f"{'  dense probe':14s}      {dflops/1e9:7.2f} GFLOP  "
                  f"{dtput:7.1f} TF/s ({100*dtput/BF16_PEAK_TFLOPS:4.1f}% peak)")

    total_flops = sum(r["flops"] * r["count"] for r in results)
    conv_time = sum(r["flops"] * r["count"] / (r["tflops"] * 1e12) for r in results)
    bound_sps = B / (1000.0 * conv_time)
    eff_tflops = total_flops / conv_time / 1e12
    summary = dict(
        batch=B,
        unet_conv_gflops_per_forward=round(total_flops / 1e9, 1),
        conv_only_time_ms_per_step=round(conv_time * 1e3, 3),
        effective_tflops=round(eff_tflops, 1),
        pct_peak=round(100 * eff_tflops / BF16_PEAK_TFLOPS, 1),
        bound_samples_per_sec_1000step=round(bound_sps, 3),
        bound_vs_baseline=round(bound_sps / BASELINE_SAMPLES_PER_SEC, 1),
        target_20x_samples_per_sec=round(20 * BASELINE_SAMPLES_PER_SEC, 3),
        reachable_20x_by_conv_alone=bool(bound_sps >= 20 * BASELINE_SAMPLES_PER_SEC),
        shapes=results,
    )
    print(json.dumps({k: v for k, v in summary.items() if k != "shapes"}, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))
    return summary


if __name__ == "__main__":
    main()
