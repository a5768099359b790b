"""Protocol-level int8 promotion gate: per-metric deltas bf16 vs int8_static.

VERDICT r3 #3b: the int8 headline must be gated on the FULL wo_mm protocol
run twice (bf16 and int8_static) through the TRAINED evaluator, with the
deltas checked across FID / diversity / trajectory error / keyframe error /
skating ratio — not keyframe error alone (reference protocol:
/root/reference/eval/eval_humanml_condmdi.py:215-332).

The protocol runs themselves happen on the TPU (scripts/round3_battery.sh
steps 4/5) and commit self-describing reports next to the gate checkpoint;
this test consumes the committed artifacts so the gate is re-checked on
every CI run and the reports can't silently diverge.
"""

import json
import math
from pathlib import Path

import pytest

_RUN = Path(__file__).resolve().parent.parent / "save" / "synthetic_unet_m"
BF16 = _RUN / "eval_benchmark_sparse_wo_mm.json"
INT8 = _RUN / "eval_benchmark_sparse_wo_mm_int8_static.json"

def _bench_headline_is_int8() -> bool:
    """bench.py's default headline mode (BENCH_MODEL unset)."""
    import re

    src = (Path(__file__).resolve().parent.parent / "bench.py").read_text()
    m = re.search(r'os\.environ\.get\("BENCH_MODEL",\s*"([^"]+)"\)', src)
    return bool(m) and "int8" in m.group(1)


def test_int8_headline_requires_protocol_artifacts():
    """VERDICT r3 #2: a gate that skips is not a gate. If bench.py's default
    headline is the int8 path, BOTH wo_mm protocol reports (bf16 + int8)
    must exist — their absence FAILS the suite instead of silently skipping
    the delta checks below."""
    if not _bench_headline_is_int8():
        pytest.skip("bench headline is not int8 — protocol delta gate not required")
    missing = [p.name for p in (BF16, INT8) if not p.exists()]
    assert not missing, (
        f"bench.py headlines int8 but the wo_mm protocol artifacts {missing} "
        f"are absent under {_RUN} — run scripts/round4_battery.sh legs 2-3 "
        "(or demote the headline to bf16)"
    )


# the delta checks themselves still need both artifacts present
_delta_mark = pytest.mark.skipif(
    not (BF16.exists() and INT8.exists()),
    reason="committed bf16+int8 wo_mm protocol reports absent "
    "(their required presence is enforced by "
    "test_int8_headline_requires_protocol_artifacts)",
)


def _load(path):
    with open(path) as f:
        return json.load(f)


def _mean(report, key, idx=None):
    m = report[key]["mean"]
    return m[idx] if idx is not None else m


@_delta_mark
def test_reports_are_same_protocol():
    b, q = _load(BF16), _load(INT8)
    for k in ("eval_mode", "edit_mode", "model_path", "guidance_param",
              "num_samples", "seed", "evaluator"):
        assert b["meta"][k] == q["meta"][k], k
    assert b["meta"]["precision_mode"] == "float"
    assert q["meta"]["precision_mode"] == "int8_static"
    # the gate is only meaningful through a discriminative evaluator
    assert b["meta"]["evaluator"] != "random_init"


@_delta_mark
def test_int8_metric_deltas_within_gate():
    b, q = _load(BF16), _load(INT8)

    # FID: relative delta, floored by the replication noise (conf ≈ 1.96σ/√n)
    fid_b, fid_q = _mean(b, "fid"), _mean(q, "fid")
    fid_floor = 3 * max(b["fid"]["conf"], q["fid"]["conf"])
    assert abs(fid_q - fid_b) <= max(0.10 * fid_b, fid_floor), (fid_b, fid_q)

    # keyframe error: the paper's headline conditioning metric
    kf_b, kf_q = _mean(b, "keyframe_error"), _mean(q, "keyframe_error")
    assert abs(kf_q - kf_b) <= 0.05 * kf_b, (kf_b, kf_q)

    # diversity: int8 must not collapse or inflate the sample distribution
    dv_b, dv_q = _mean(b, "diversity"), _mean(q, "diversity")
    assert abs(dv_q - dv_b) <= 0.05 * dv_b, (dv_b, dv_q)

    # skating ratio: absolute-delta gate (it is already a small fraction)
    sk_b, sk_q = _mean(b, "skating_ratio"), _mean(q, "skating_ratio")
    assert abs(sk_q - sk_b) <= max(0.01, 0.15 * sk_b), (sk_b, sk_q)

    # trajectory error (20cm/50cm threshold rates live at idx 0/1; final
    # entry is mean location error — gate the mean error relatively)
    tr_b, tr_q = _mean(b, "traj_error", -1), _mean(q, "traj_error", -1)
    assert abs(tr_q - tr_b) <= 0.05 * tr_b, (tr_b, tr_q)

    # R-precision top-3: int8 must not lose caption consistency
    rp_b, rp_q = _mean(b, "r_precision")[2], _mean(q, "r_precision")[2]
    assert rp_q >= rp_b - 0.05, (rp_b, rp_q)


@_delta_mark
def test_bf16_numbers_are_discriminative():
    """The gate checkpoint itself must clear chance through the trained
    evaluator — otherwise the delta gate above is vacuous (a model whose
    outputs the evaluator can't rank can't expose quantization damage)."""
    b = _load(BF16)
    top1, top2, top3 = _mean(b, "r_precision")
    # chance at batch 32 is 1/32, 2/32, 3/32
    assert top3 > 3 / 32 + 0.05, (top1, top2, top3)
    assert not math.isnan(_mean(b, "fid"))
