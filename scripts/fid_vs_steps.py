"""FID / keyframe-error vs training steps, scored by the trained evaluator.

VERDICT r3 #1 done-criterion: with the in-image contrastive evaluator the
quality numbers must MEAN something — FID should fall (and R-precision
rise) as the gate checkpoint trains. Runs the debug protocol (5
replications) on every saved checkpoint of a training run in ONE process
(the sampling scan compiles once and is reused across checkpoints), plus a
step-0 random-init baseline.

Usage:
  python scripts/fid_vs_steps.py --run_dir save/synthetic_unet_m \
      [--eval_mode debug] [--num_samples 32] [--out fid_vs_steps.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", default="save/synthetic_unet_m")
    ap.add_argument("--eval_mode", default="debug")
    ap.add_argument("--num_samples", type=int, default=32)
    ap.add_argument("--guidance_param", type=float, default=1.0)
    ap.add_argument("--use_ema", default="false")
    # sweep with the observation mask zeroed: isolates whether the FID-vs-
    # steps drift is specific to imputation-constrained sampling (the
    # committed conditioned sweeps bottom at 20k then rise while keyframe
    # error keeps falling) or a property of the model's raw distribution.
    ap.add_argument("--drop_observations", default="false")
    # cap replications per checkpoint (chip-time knob: 256 samples x 3 reps
    # beats 32 x 5 on FID bias at similar cost)
    ap.add_argument("--max_replications", type=int, default=0)
    ap.add_argument("--out", default="")
    # incremental mode: reuse rows already present in --out (matched by step)
    # and only evaluate checkpoints not yet in it. Lets a train -> sweep ->
    # commit loop extend the curve without re-burning chip time on earlier
    # checkpoints. Only rows generated with identical eval settings are
    # reusable; on any settings mismatch the old file is ignored wholesale.
    ap.add_argument("--update", default="false")
    args = ap.parse_args(argv)

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

    from condmdi_tpu.evals.run import main as eval_main

    run_dir = Path(args.run_dir)
    targs = json.loads((run_dir / "args.json").read_text())
    ckpts = sorted(run_dir.glob("ckpt_*"))
    points = [(0, None)] + [(int(p.name.split("_")[-1]), p) for p in ckpts]

    def ckpt_id(path):
        # run identity for the --update reuse gate: a retrain that rewrites a
        # checkpoint at the same step in the same run_dir must invalidate the
        # old row (the round-4 256-clip-bug scenario). mtime+size over the
        # checkpoint tree changes whenever the weights are rewritten.
        if path is None:
            return "random_init"
        files = sorted(p for p in Path(path).rglob("*") if p.is_file())
        return f"{max((p.stat().st_mtime_ns for p in files), default=0)}:" \
               f"{sum(p.stat().st_size for p in files)}"

    ids = {step: ckpt_id(path) for step, path in points}

    out_path = Path(args.out) if args.out else run_dir / "fid_vs_steps.json"
    reused: dict[int, dict] = {}
    if args.update == "true" and out_path.exists():
        settings = dict(
            eval_mode=args.eval_mode, num_samples=args.num_samples,
            use_ema=args.use_ema == "true",
            guidance_param=args.guidance_param,
            max_replications=args.max_replications,
            drop_observations=args.drop_observations == "true",
            run_dir=str(run_dir),
        )
        try:
            prev = json.loads(out_path.read_text())
            if all(prev.get(k) == v for k, v in settings.items()):
                for r in prev.get("rows", []):
                    step = int(r["step"])
                    if step not in ids:
                        print(f"[fid_vs_steps] --update: dropping row for step "
                              f"{step} (checkpoint no longer exists)")
                    elif r.get("ckpt_id") != ids[step]:
                        print(f"[fid_vs_steps] --update: dropping row for step "
                              f"{step} (checkpoint rewritten since the row was "
                              f"computed)")
                    else:
                        reused[step] = r
                print(f"[fid_vs_steps] --update: reusing {len(reused)} rows "
                      f"from {out_path}")
            else:
                print("[fid_vs_steps] --update: settings changed, ignoring old rows")
        except (json.JSONDecodeError, KeyError, TypeError, ValueError) as e:
            print(f"[fid_vs_steps] --update: prev file unusable ({e!r}), "
                  "running a fresh sweep")
            reused = {}

    # zero-prediction baseline: keyframe/traj error of the all-zeros sample
    # (= the population-mean motion in denormalized space) on the same eval
    # population and benchmark_sparse frames. The final checkpoint must beat
    # this for "the model learned" to mean anything (VERDICT r4 item 1).
    # Computed BEFORE the sweep so incremental partial writes below carry it.
    import jax
    import jax.numpy as jnp

    from condmdi_tpu.data.convert import sample_to_motion
    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate
    from condmdi_tpu.evals.harness import compute_kps_error
    from condmdi_tpu.models.text import HashTextEncoder
    from condmdi_tpu.training.keyframes import get_keyframes_mask

    T = int(targs.get("num_frames", 224))
    B = 32
    ds_abs = SyntheticMotionDataset(
        DatasetConfig(max_motion_length=T, abs_3d=True, split="test"),
        size=max(args.num_samples, B), seed=1,
    )
    errs, nkfs = [], []
    for bi in range(max(args.num_samples, B) // B):
        batch = collate([ds_abs[bi * B + i] for i in range(B)], T, HashTextEncoder())
        obs_mask = get_keyframes_mask(
            jax.random.key(bi), jnp.asarray(batch["lengths"]), T,
            edit_mode="benchmark_sparse", trans_length=10,
        )
        obs_mask = obs_mask & jnp.asarray(batch["time_mask"])[..., None]
        gt_j = np.asarray(sample_to_motion(jnp.asarray(batch["motion"]), ds_abs.stats))
        zero_j = np.asarray(
            sample_to_motion(jnp.zeros_like(jnp.asarray(batch["motion"])), ds_abs.stats)
        )
        kf = np.asarray(obs_mask.any(axis=-1))
        e, n = compute_kps_error(zero_j, gt_j, kf, traj_only=False)
        errs.append(e)
        nkfs.append(n)
    zero_kf_err = float(
        np.concatenate(errs).sum() / max(np.concatenate(nkfs).sum(), 1)
    )
    print(f"[fid_vs_steps] zero-prediction baseline keyframe error = {zero_kf_err:.4f}")

    def write_out(rows):
        out = dict(
            run_dir=str(run_dir), eval_mode=args.eval_mode,
            num_samples=args.num_samples, evaluator="trained_synthetic",
            use_ema=args.use_ema == "true",
            guidance_param=args.guidance_param,
            max_replications=args.max_replications,
            drop_observations=args.drop_observations == "true",
            zero_baseline_keyframe_error=zero_kf_err, rows=rows,
        )
        out_path.write_text(json.dumps(out, indent=1))
        return out

    def run_eval(argv_eval, attempts=3):
        # the remote-compile RPC is occasionally flaky (observed: "response
        # body closed before all bytes were read" killing a 90-minute sweep
        # after one point). Bounded retries; anything persistent still raises.
        import time as _time
        for a in range(attempts):
            try:
                return eval_main(argv_eval)
            except (jax.errors.JaxRuntimeError, OSError) as e:
                if a == attempts - 1:
                    raise
                print(f"[fid_vs_steps] eval attempt {a + 1} failed ({e!r}); "
                      "retrying in 30s")
                _time.sleep(30)

    rows = []
    for step, path in points:
        if step in reused:
            rows.append(reused[step])
            print(f"[fid_vs_steps] step {step}: reused committed row")
            continue
        argv_eval = [
            "--eval_mode", args.eval_mode,
            "--edit_mode", "benchmark_sparse",
            "--guidance_param", str(args.guidance_param),
            "--num_samples", str(args.num_samples),
            "--use_ema", args.use_ema,
            "--output_dir", "/tmp/fid_vs_steps_out",
            "--drop_observations", args.drop_observations,
        ]
        if args.max_replications:
            argv_eval += ["--max_replications", str(args.max_replications)]
        if path is None:
            # random init at the run's architecture
            argv_eval += [
                "--arch", str(targs.get("arch", "unet")),
                "--latent_dim", str(targs.get("latent_dim", 128)),
                "--diffusion_steps", str(targs.get("diffusion_steps", 1000)),
                "--num_frames", str(targs.get("num_frames", 224)),
                "--abs_3d", str(targs.get("abs_3d", True)).lower(),
                "--model_path", "",
            ]
            argv_eval += ["--dim_mults"] + [
                str(int(m)) for m in targs.get("dim_mults", (1, 2, 2))
            ]
        else:
            argv_eval += ["--model_path", str(path)]
        summary = run_eval(argv_eval)
        row = dict(
            step=step,
            ckpt_id=ids[step],
            params_fingerprint=summary.get("params_fingerprint", ""),
            fid=float(np.ravel(summary["fid"]["mean"])[0]),
            keyframe_error=float(np.ravel(summary["keyframe_error"]["mean"])[0]),
            traj_error_mean=float(np.ravel(summary["traj_error"]["mean"])[-1]),
            r_precision=[round(float(x), 4) for x in np.ravel(summary["r_precision"]["mean"])],
            matching_score=float(np.ravel(summary["matching_score"]["mean"])[0]),
        )
        rows.append(row)
        print(f"[fid_vs_steps] {row}")
        # incremental write: a crash mid-sweep (remote-compile flake, OOM,
        # timeout) preserves every completed point; a --update rerun reuses
        # them and only recomputes what's missing.
        write_out(rows)

    out = write_out(rows)
    print(f"[fid_vs_steps] wrote {out_path}")
    return out


if __name__ == "__main__":
    main()
