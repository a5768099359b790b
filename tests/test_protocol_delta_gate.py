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
# the float-tail mixed-step candidate (round-5 finding: the last ~250 steps
# carry virtually all of int8's conditioning damage; a float tail recovers
# float-level quality at ~1.45x the bf16 speed)
F250 = _RUN / "eval_benchmark_sparse_wo_mm_int8_static_f250.json"

# round-4 archive: the pair behind the int8 -> bf16 demotion. The generating
# checkpoint was lost to a disk wipe, so these are read-only evidence — but
# the DECISION they encode (int8_static fails the protocol gate) must stay
# machine-checked even while the live parent-dir pair is regenerated.
_ARCHIVE = _RUN / "stale_r4_lostckpt"
BF16_R4 = _ARCHIVE / "eval_benchmark_sparse_wo_mm.json"
INT8_R4 = _ARCHIVE / "eval_benchmark_sparse_wo_mm_int8_static.json"

def _bench_headline() -> str:
    """bench.py's default headline mode (BENCH_MODEL unset)."""
    import re

    src = (Path(__file__).resolve().parent.parent / "bench.py").read_text()
    m = re.search(r'os\.environ\.get\("BENCH_MODEL",\s*"([^"]+)"\)', src)
    return m.group(1) if m else "unet"


def _bench_float_last_k() -> int:
    """bench.py's default float-tail length (BENCH_FLOAT_LAST_K unset)."""
    import re

    src = (Path(__file__).resolve().parent.parent / "bench.py").read_text()
    m = re.search(r'os\.environ\.get\("BENCH_FLOAT_LAST_K",\s*"(\d+)"\)', src)
    return int(m.group(1)) if m else 0


def _bench_headline_is_int8() -> bool:
    return "int8" in _bench_headline()


def _headline_int8_report() -> Path:
    """The protocol report that must back the CURRENT headline flavor:
    the f{K} mixed-step pair for unet_int8_mixed (K = bench.py's default
    tail), the pure pair otherwise — so changing the headline K without
    committing its protocol pair fails the suite."""
    if _bench_headline() == "unet_int8_mixed":
        return _RUN / (
            f"eval_benchmark_sparse_wo_mm_int8_static_f{_bench_float_last_k()}.json"
        )
    return INT8


def test_int8_headline_requires_protocol_artifacts():
    """VERDICT r3 #2: a gate that skips is not a gate. If bench.py's default
    headline is the int8 path, BOTH wo_mm protocol reports (bf16 + int8)
    must exist — their absence FAILS the suite instead of silently skipping
    the delta checks below."""
    if not _bench_headline_is_int8():
        pytest.skip("bench headline is not int8 — protocol delta gate not required")
    missing = [p.name for p in (BF16, _headline_int8_report()) if not p.exists()]
    assert not missing, (
        f"bench.py headlines {_bench_headline()} but the wo_mm protocol "
        f"artifacts {missing} are absent under {_RUN} — regenerate the pair "
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


def _delta_violations(b, q):
    """Per-metric gate checks; returns a list of human-readable violations
    (empty = int8 is protocol-indistinguishable enough to headline)."""
    bad = []

    # FID: relative delta, floored by the replication noise (conf ≈ 1.96σ/√n)
    fid_b, fid_q = _mean(b, "fid"), _mean(q, "fid")
    fid_floor = 3 * max(b["fid"]["conf"], q["fid"]["conf"])
    if abs(fid_q - fid_b) > max(0.10 * fid_b, fid_floor):
        bad.append(f"fid {fid_b:.1f}->{fid_q:.1f} (>10%)")

    # keyframe error: the paper's headline conditioning metric
    kf_b, kf_q = _mean(b, "keyframe_error"), _mean(q, "keyframe_error")
    if abs(kf_q - kf_b) > 0.05 * kf_b:
        bad.append(f"keyframe_error {kf_b:.3f}->{kf_q:.3f} (>5%)")

    # diversity: int8 must not collapse or inflate the sample distribution
    dv_b, dv_q = _mean(b, "diversity"), _mean(q, "diversity")
    if abs(dv_q - dv_b) > 0.05 * dv_b:
        bad.append(f"diversity {dv_b:.2f}->{dv_q:.2f} (>5%)")

    # skating ratio: absolute-delta gate (it is already a small fraction)
    sk_b, sk_q = _mean(b, "skating_ratio"), _mean(q, "skating_ratio")
    if abs(sk_q - sk_b) > max(0.01, 0.15 * sk_b):
        bad.append(f"skating_ratio {sk_b:.4f}->{sk_q:.4f}")

    # trajectory error (20cm/50cm threshold rates live at idx 0/1; final
    # entry is mean location error — gate the mean error relatively)
    tr_b, tr_q = _mean(b, "traj_error", -1), _mean(q, "traj_error", -1)
    if abs(tr_q - tr_b) > 0.05 * tr_b:
        bad.append(f"traj_error {tr_b:.3f}->{tr_q:.3f} (>5%)")

    # R-precision top-3: int8 must not lose caption consistency
    rp_b, rp_q = _mean(b, "r_precision")[2], _mean(q, "r_precision")[2]
    if rp_q < rp_b - 0.05:
        bad.append(f"r_precision@3 {rp_b:.3f}->{rp_q:.3f}")
    return bad


@_delta_mark
def test_int8_promotion_gate_drives_headline():
    """The gate in BOTH directions: if bench.py headlines an int8 path, the
    committed protocol deltas of THAT path's pair MUST be inside the gate;
    if the pure-int8 deltas exceed the gate, the headline MUST NOT be pure
    int8 (round-4 outcome: keyframe error +31% / FID +27% / traj +49% →
    demoted to bf16; round-5: the live pair replicates it at +28%/+9%/+50%,
    while the float-tail K=250 pair is the promotion candidate)."""
    if _bench_headline_is_int8():
        qpath = _headline_int8_report()
        b, q = _load(BF16), _load(qpath)
        bad = _delta_violations(b, q)
        assert not bad, (
            f"bench.py headlines {_bench_headline()} but {qpath.name}'s "
            f"protocol deltas exceed the promotion gate: {bad} — demote the "
            "headline to bf16 or fix the int8 path"
        )
        return
    b, q = _load(BF16), _load(INT8)
    bad = _delta_violations(b, q)
    if not bad:
        # deltas are inside the gate yet the headline is bf16 — promotion is
        # allowed (not forced); record the fact so it is visible in -v runs.
        pytest.skip(f"int8 deltas inside gate ({BF16.name} vs {INT8.name}); "
                    "int8 headline promotion is available")
    else:
        # demotion branch: deltas exceed the gate AND the headline is bf16 —
        # the gate held. Nothing to assert beyond internal consistency.
        assert bad


def test_archived_r4_pair_justifies_the_demotion():
    """The round-4 demotion decision, checked against its committed evidence:
    the archived g1.0 992x20 wo_mm pair must (a) exist, (b) be the same
    protocol, and (c) show deltas OUTSIDE the promotion gate — otherwise the
    demotion narrative in BENCH_NOTES/quant.py is unbacked. This runs against
    the read-only archive regardless of whether the live pair exists yet."""
    assert BF16_R4.exists() and INT8_R4.exists(), (
        "the archived round-4 demotion evidence is missing from "
        f"{_ARCHIVE} — the int8->bf16 demotion decision is unbacked"
    )
    b, q = _load(BF16_R4), _load(INT8_R4)
    for k in ("eval_mode", "edit_mode", "guidance_param", "num_samples",
              "seed", "evaluator"):
        assert b["meta"][k] == q["meta"][k], k
    bad = _delta_violations(b, q)
    assert bad, (
        "the archived round-4 pair is INSIDE the promotion gate — the "
        "demotion to bf16 would have been unjustified; re-examine"
    )
    # the specific signature the demotion cited (BENCH_NOTES round-4)
    assert any("keyframe_error" in v for v in bad), bad


@_delta_mark
def test_bf16_numbers_are_discriminative():
    """The gate checkpoint itself must clear chance through the trained
    evaluator — otherwise the delta gate above is vacuous (a model whose
    outputs the evaluator can't rank can't expose quantization damage)."""
    b = _load(BF16)
    top1, top2, top3 = _mean(b, "r_precision")
    conf3 = b["r_precision"]["conf"][2]
    # chance at batch 32 is 1/32, 2/32, 3/32. Margin is statistical, not a
    # fixed 0.05: caption adherence scales with guidance (the g2.5 report
    # ran at +0.05 over chance; the g1.0 protocol report is +0.019 with a
    # ±0.004 replication conf — still >3 sigma above chance).
    assert top3 > 3 / 32 + max(0.01, 3 * conf3), (top1, top2, top3, conf3)
    assert not math.isnan(_mean(b, "fid"))


@pytest.mark.skipif(not (BF16.exists() and F250.exists()),
                    reason="float-tail K=250 pair absent")
def test_f250_pair_is_same_protocol():
    """The promotion-candidate pair must be protocol-identical to the bf16
    anchor and self-describe its mixed-step configuration."""
    b, q = _load(BF16), _load(F250)
    for k in ("eval_mode", "edit_mode", "model_path", "guidance_param",
              "num_samples", "seed", "evaluator"):
        assert b["meta"][k] == q["meta"][k], k
    assert q["meta"]["precision_mode"] == "int8_static"
    assert q["meta"]["int8_float_last_k"] == 250
    assert b["meta"]["evaluator"] != "random_init"
