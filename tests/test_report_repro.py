"""Committed eval reports must stay re-derivable (VERDICT r2 weak #8/#10).

Re-runs replication 0 of the committed wo_mm protocol report with the same
seeds/model/evaluator and matches the stored per-replication values — a
silent harness regression can no longer leave a stale-but-plausible report
in-tree.
"""

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # protocol-scale; fast gate skips

REPORT = Path("save/synthetic_unet_s/eval_benchmark_sparse_wo_mm.json")


class TestCommittedReportRepro:
    def test_replication0_rederives(self, tmp_path):
        if not REPORT.exists():
            pytest.skip("committed wo_mm report absent")
        blob = json.loads(REPORT.read_text())
        if "per_replication" not in blob:
            pytest.skip("report predates per-replication storage")
        meta = blob.get("meta", {})

        from condmdi_tpu.evals.run import main

        summary = main([
            "--eval_mode", "wo_mm",
            "--max_replications", "1",
            "--model_path", meta["model_path"],
            "--edit_mode", meta.get("edit_mode", "benchmark_sparse"),
            "--guidance_param", str(meta.get("guidance_param", 1.0)),
            "--num_samples", str(meta.get("num_samples", 64)),
            "--output_dir", str(tmp_path),
        ])

        stored = blob["per_replication"]
        for key in ("keyframe_error", "matching_score", "fid", "diversity"):
            got = float(np.ravel(summary[key]["mean"])[0])
            want = float(np.ravel(stored[key][0])[0]) if np.ndim(stored[key][0]) else float(stored[key][0])
            # replication 0 uses identical seeds; tolerance covers fp
            # reassociation (mesh partitioning, sqrtm) only
            assert abs(got - want) <= max(2e-2 * abs(want), 1e-3), (key, got, want)
        r_got = np.ravel(summary["r_precision"]["mean"])
        r_want = np.ravel(stored["r_precision"][0])
        np.testing.assert_allclose(r_got, r_want, atol=1e-6)
