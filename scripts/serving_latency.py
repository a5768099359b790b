"""Interactive serving latency: one keyframe-conditioned request at B=1.

The throughput bench (bench.py) answers "samples/sec/chip at batch"; this
answers the serving question: how long does ONE user's in-betweening
request take on one chip, for the 1000-step DDPM the paper uses and the
DDIM-50 respacing a production deployment would pick.

Reports per-request latency by timing N back-to-back requests inside one
jitted scan (axon relay: only ≥10 s programs time reliably — BENCH_NOTES).

Usage: python scripts/serving_latency.py [--model unet|mdm] [--reps 20]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("unet", "mdm"), default="unet")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--frames", type=int, default=196)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + few steps: CPU smoke of the measurement "
                         "paths, not a real latency number")
    ap.add_argument("--precision_mode",
                    choices=("float", "int8", "int8_static", "int8_prequant"),
                    default="float",
                    help="unet only: int8 serving paths (B=1 is weight-"
                         "bandwidth-bound, int8 halves weight traffic)")
    ap.add_argument("--server", action="store_true",
                    help="route requests through MotionServer (the bucketed "
                         "micro-batcher, serving.py) instead of flat jit "
                         "dispatch — measures the ACTUAL serving runtime, "
                         "queue+pad+bucket overhead included (VERDICT r3 #8)")
    ap.add_argument("--server_reps", type=int, default=600,
                    help="sequential B=1 requests through the server (sized "
                         "so total exceeds the 10 s axon trust floor)")
    ap.add_argument("--server_burst", type=int, default=256,
                    help="concurrent requests for the throughput measurement")
    args = ap.parse_args(argv)

    if args.tiny:
        # CPU smoke must NEVER touch the TPU: a second axon client wedges a
        # running TPU job (observed r3: the victim spins in sys-time forever)
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from condmdi_tpu.diffusion import (
        DiffusionConfig,
        DiffusionSchedule,
        get_named_beta_schedule,
        space_timesteps,
    )
    from condmdi_tpu.diffusion.sampling import SamplerConfig, ddpm_sample_loop, ddim_sample_loop

    B, T, F = 1, (28 if args.tiny else args.frames), 263
    if args.model == "unet":
        from condmdi_tpu.models.unet import MDM_UNET

        model = MDM_UNET(
            njoints=F,
            latent_dim=16 if args.tiny else 512,
            dim_mults=(1, 2) if args.tiny else (2, 2, 2, 2),
            keyframe_conditioned=True,
            pad_frames_to=32 if args.tiny else 224,
            precision_mode=args.precision_mode,
        )
        kw = dict(
            obs_x0=jnp.zeros((B, T, F), jnp.bfloat16),
            obs_mask=jnp.zeros((B, T, F), bool).at[:, ::20, :].set(True),
        )
    else:
        from condmdi_tpu.models.mdm import MDM

        if args.tiny:
            model = MDM(njoints=F, latent_dim=32, ff_size=64, num_layers=1, num_heads=2)
        else:
            model = MDM(njoints=F, latent_dim=512, ff_size=1024, num_layers=8, num_heads=4)
        kw = {}

    y = {"text_embed": jnp.zeros((B, 512), jnp.bfloat16)}
    x0 = jnp.zeros((B, T, F))
    if args.model == "unet" and args.precision_mode == "int8_prequant":
        # init the float twin, pre-quantize its weights, serve int8-resident
        from condmdi_tpu.models.unet import MDM_UNET as _U
        from condmdi_tpu.ops.quant import quantize_params_tree

        float_twin = _U(
            njoints=F, latent_dim=16 if args.tiny else 512,
            dim_mults=(1, 2) if args.tiny else (2, 2, 2, 2),
            keyframe_conditioned=True, pad_frames_to=32 if args.tiny else 224,
        )
        fv = float_twin.init(jax.random.key(0), x0, jnp.zeros((B,), jnp.int32), y, **kw)
        qtree = quantize_params_tree(fv["params"])
        _, upd = model.apply(
            {"params": qtree}, x0, jnp.zeros((B,), jnp.int32), y, **kw,
            mutable=["act_scale"],
        )
        params = {"params": qtree, "act_scale": upd["act_scale"]}
    else:
        params = model.init(jax.random.key(0), x0, jnp.zeros((B,), jnp.int32), y, **kw)
    # bf16 cast covers the weights ONLY — mirroring bench.py: calibrated
    # act_scale amaxes and per-channel quant scales stay f32 so the dequant
    # epilogue precision matches the benched configuration (ADVICE r2)
    params = {
        **params,
        "params": jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params["params"],
        ),
    }

    def measure(name, steps, use_ddim, flat=False, reps=None):
        """flat=False: reps nested in one jitted lax.scan (one program, one
        dispatch). flat=True: ONE request per jitted call, reps back-to-back
        host dispatches — the shape a real serving loop has, and a flat
        program the axon relay times reliably once total ≥10 s (the nested
        high-rep scans hit transient `UNAVAILABLE: TPU device error`s;
        BENCH_NOTES.md)."""
        reps = reps or args.reps
        base = get_named_beta_schedule("cosine", 1000)
        if steps == 1000:
            sched = DiffusionSchedule.create(base)
        else:
            sched = DiffusionSchedule.create(
                base, use_timesteps=space_timesteps(1000, f"ddim{steps}")
            )
        loop = ddim_sample_loop if use_ddim else ddpm_sample_loop

        def denoise_with(params):
            def denoise(x_t, t):
                out = model.apply(params, x_t.astype(jnp.bfloat16), t, y, **kw)
                return out.astype(x_t.dtype)

            return denoise

        if flat:
            @jax.jit
            def serve_one(params, key):
                out = loop(
                    denoise_with(params), sched, DiffusionConfig(), (B, T, F),
                    key, sampler=SamplerConfig(),
                )
                return jnp.mean(out)

            serve_one(params, jax.random.key(0)).block_until_ready()  # compile
            keys = [jax.random.key(i + 1) for i in range(reps)]
            t0 = time.perf_counter()
            last = None
            for k in keys:
                last = serve_one(params, k)
            last.block_until_ready()
            total = time.perf_counter() - t0
        else:
            @jax.jit
            def serve_n(params, key):
                def one(carry, k):
                    out = loop(
                        denoise_with(params), sched, DiffusionConfig(),
                        (B, T, F), k, sampler=SamplerConfig(),
                    )
                    return carry + jnp.mean(out), ()

                keys = jax.random.split(key, reps)
                acc, _ = jax.lax.scan(one, jnp.zeros(()), keys)
                return acc

            serve_n(params, jax.random.key(0)).block_until_ready()  # compile
            t0 = time.perf_counter()
            serve_n(params, jax.random.key(1)).block_until_ready()
            total = time.perf_counter() - t0
        lat_ms = total / reps * 1e3
        mode = "flat-dispatch" if flat else "nested-scan"
        print(
            f"{name:22s} {lat_ms:9.1f} ms/request  "
            f"({total:.1f} s / {reps} reqs, {mode})"
        )
        if total < 10.0:
            print(f"  WARNING: total {total:.1f}s < 10s axon timing trust floor — raise reps")
        return lat_ms

    def measure_server():
        """Drive MotionServer with the DDIM-50 serving config: sequential
        B=1 latency (queue + pad + bucket dispatch included) and a burst
        throughput number. The flat-dispatch `measure` above is the floor;
        the delta IS the micro-batcher's overhead."""
        import numpy as np

        from condmdi_tpu.sampling.pipeline import SamplePipeline
        from condmdi_tpu.serving import MotionRequest, MotionServer

        steps = 4 if args.tiny else 50
        sched = DiffusionSchedule.create(
            get_named_beta_schedule("cosine", 1000),
            use_timesteps=space_timesteps(1000, f"ddim{steps}"),
        )

        def apply_fn(x, t, yy, **akw):
            return model.apply(params, x.astype(jnp.bfloat16), t, yy, **akw).astype(
                x.dtype
            )

        pipe = SamplePipeline(apply_fn, sched, DiffusionConfig(),
                              SamplerConfig(method="ddim", eta=0.0))
        max_batch = 4 if args.tiny else 32
        server = MotionServer(pipe, T, max_batch=max_batch, max_wait_ms=2.0)
        server.warmup(buckets=(1, max_batch))
        text = np.zeros((512,), np.float32)

        # sequential B=1 latency
        reps = 3 if args.tiny else args.server_reps
        server.generate(text, seed=0)  # steady-state
        t0 = time.perf_counter()
        for i in range(reps):
            server.generate(text, seed=i + 1)
        seq_total = time.perf_counter() - t0
        lat_ms = seq_total / reps * 1e3
        print(f"server ddim-{steps} seq    {lat_ms:9.1f} ms/request  "
              f"({seq_total:.1f} s / {reps} reqs, MotionServer B=1 bucket)")
        if not args.tiny and seq_total < 10.0:
            print(f"  WARNING: total {seq_total:.1f}s < 10s trust floor — raise --server_reps")

        # burst throughput: submit all at once, micro-batcher coalesces
        burst = 8 if args.tiny else args.server_burst
        reqs = [server.submit(MotionRequest(text_embed=text, seed=100 + i))
                for i in range(burst)]
        t0 = time.perf_counter()
        for r in reqs:
            r.result()
        # includes the submissions' own sampling: restart the clock cleanly
        reqs = [server.submit(MotionRequest(text_embed=text, seed=500 + i))
                for i in range(burst)]
        t0 = time.perf_counter()
        for r in reqs:
            r.result()
        burst_total = time.perf_counter() - t0
        print(f"server ddim-{steps} burst  {burst_total / burst * 1e3:9.1f} ms/request  "
              f"({burst:d} concurrent -> {burst / burst_total:.1f} req/s, "
              f"max_batch={max_batch})")
        if not args.tiny and burst_total < 10.0:
            print(f"  WARNING: burst total {burst_total:.1f}s < 10s trust floor — raise --server_burst")
        server.shutdown()
        return lat_ms

    print(f"model={args.model} B=1 T={T} bf16{' TINY-SMOKE' if args.tiny else ''}")
    if args.server:
        nst = 4 if args.tiny else 50
        flat_ms = measure(f"ddim-{nst} (flat floor)", nst,
                          use_ddim=True, flat=True,
                          reps=3 if args.tiny else max(args.reps, 400))
        srv_ms = measure_server()
        print(f"micro-batcher overhead: {srv_ms - flat_ms:+.1f} ms/request "
              f"({(srv_ms / flat_ms - 1) * 100:+.0f}%)")
        return
    if args.tiny:
        measure("ddpm-full (smoke)", 1000, use_ddim=False, reps=2)
        measure("ddim-50 (smoke-flat)", 50, use_ddim=True, flat=True, reps=3)
        measure("ddim-50 (smoke-scan)", 50, use_ddim=True, reps=2)
        return
    measure("ddpm-1000 (paper)", 1000, use_ddim=False)
    # flat mode: reps sized so total comfortably exceeds the 10 s trust floor
    measure("ddim-50 (serving)", 50, use_ddim=True, flat=True,
            reps=max(args.reps, 400))
    measure("ddim-50 (scan)", 50, use_ddim=True)


if __name__ == "__main__":
    main()
