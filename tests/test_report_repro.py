"""Committed eval reports must stay re-derivable (VERDICT r2 weak #8/#10).

Re-runs replication 0 of the committed wo_mm protocol reports with the same
seeds/model/evaluator and matches the stored per-replication values — a
silent harness regression can no longer leave a stale-but-plausible report
in-tree. Covers both gate checkpoints when present (the round-2 unet_s
report predates per-replication storage and is skipped; the round-3 unet_m
bf16 + int8_static reports carry it).
"""

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # protocol-scale; fast gate skips

_SAVE = Path(__file__).resolve().parent.parent / "save"
REPORTS = [
    _SAVE / "synthetic_unet_s" / "eval_benchmark_sparse_wo_mm.json",
    _SAVE / "synthetic_unet_m" / "eval_benchmark_sparse_wo_mm.json",
    _SAVE / "synthetic_unet_m" / "eval_benchmark_sparse_wo_mm_int8_static.json",
]


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
        assert ckpt.exists(), f"committed report's checkpoint missing: {ckpt}"

        argv = [
            "--eval_mode", "wo_mm",
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
        summary = main(argv)

        import jax

        if "platform" not in meta:
            # ADVICE r3: guessing "cpu" for legacy reports silently weakens
            # (or falsely tightens) the tolerance — skip instead
            pytest.skip("report predates platform recording")
        same_platform = meta["platform"] == jax.devices()[0].platform
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
