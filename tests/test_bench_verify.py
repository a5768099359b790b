"""bench.py validity cross-check: the committed CPU goldens must reproduce.

bench.py's headline number is a throughput measurement; this golden ties the
benched program (same model family, same sampler code path) to a correct
sampler output (VERDICT r1 weak #3). The golden is generated on CPU by
scripts/make_bench_golden.py; bench.py re-runs the same deterministic
trajectory on the real chip and compares within a cross-platform tolerance.
Here we re-run on CPU and require near-exact agreement — any drift means the
benched code path changed numerically and the golden must be regenerated
(consciously).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


@pytest.mark.slow
@pytest.mark.parametrize("which,pad", [("unet", "224"), ("mdm", "224"), ("unet", "200")])
def test_cpu_golden_reproduces(which, pad, monkeypatch):
    monkeypatch.setenv("BENCH_PAD", pad)
    path = Path(bench.GOLDEN_PATH.format(which=bench.golden_name(which)))
    if not path.exists():
        pytest.skip(f"golden for {bench.golden_name(which)} not generated")
    golden = np.asarray(json.loads(path.read_text())["slice"])
    got = bench.verify_trajectory(which)
    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, atol=1e-4, rtol=0)


def test_check_against_golden_reports_mismatch(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "GOLDEN_PATH", str(tmp_path / "g_{which}.json"))
    monkeypatch.setenv("BENCH_PAD", "224")  # un-suffixed golden family names
    slice_ = np.zeros((2, 3))
    # absent golden -> (None, None)
    ok, err = bench.check_against_golden("x", slice_, atol=1e-3)
    assert ok is None and err is None
    (tmp_path / "g_x.json").write_text(json.dumps({"slice": slice_.tolist()}))
    ok, err = bench.check_against_golden("x", slice_, atol=1e-3)
    assert ok is True and err == 0.0
    ok, err = bench.check_against_golden("x", slice_ + 1.0, atol=1e-3)
    assert ok is False and err == pytest.approx(1.0)
    # shape mismatch -> hard fail
    ok, err = bench.check_against_golden("x", np.zeros((2, 4)), atol=1e-3)
    assert ok is False and err == float("inf")


def test_int8_checks_against_float_family_golden(tmp_path, monkeypatch):
    """int8 configs verify against the float golden with a mean-rel bound
    (XLA CPU has no practical int8 conv path to generate an int8 golden)."""
    monkeypatch.setattr(bench, "GOLDEN_PATH", str(tmp_path / "g_{which}.json"))
    monkeypatch.setenv("BENCH_PAD", "224")  # un-suffixed golden family names
    golden = np.full((2, 3), 2.0)
    (tmp_path / "g_unet.json").write_text(json.dumps({"slice": golden.tolist()}))
    ok, err = bench.check_against_golden("unet_int8", golden * 1.05, atol=0.0)
    assert ok is True and err == pytest.approx(0.05)
    ok, err = bench.check_against_golden("unet_int8", golden * 1.5, atol=0.0)
    assert ok is False
