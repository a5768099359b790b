"""Asset-day parity pipeline rehearsed against mocked downloads.

VERDICT r2 #6: when assets/network appear, parity must be one invocation.
This test fabricates every required asset in miniature — a reference-format
model .pt (built from the REAL reference MDM_UNET and round-tripped through
the torch→JAX converter), a GloVe vocabulary, a T2M evaluator finest.tar
with the reference's state-dict schema, and an on-disk HumanML3D tree —
then runs `evals.parity` end-to-end: asset check → convert → protocol →
comparison table.
"""

import json
import pickle
import sys
import types
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e scale; fast gate skips


def _fake_glove(root, words=("sos", "eos", "unk", "a", "person", "walks")):
    g = root / "glove"
    g.mkdir(parents=True)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((len(words), 300)).astype(np.float32)
    np.save(g / "our_vab_data.npy", data)
    with open(g / "our_vab_words.pkl", "wb") as fh:
        pickle.dump(list(words), fh)
    with open(g / "our_vab_idx.pkl", "wb") as fh:
        pickle.dump({w: i for i, w in enumerate(words)}, fh)


def _fake_finest_tar(root):
    """finest.tar with the reference state-dict schema (evaluator_wrapper
    checkpoint layout) at the real dims — exercises from_torch_checkpoint."""
    import torch

    t = root / "t2m" / "text_mot_match" / "model"
    t.mkdir(parents=True)
    g = torch.Generator().manual_seed(0)

    def W(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    mov = {
        "main.0.weight": W(512, 259, 4), "main.0.bias": W(512),
        "main.3.weight": W(512, 512, 4), "main.3.bias": W(512),
        "out_net.weight": W(512, 512), "out_net.bias": W(512),
    }

    def bigru(inp, hid, out_in, out_hid, pos=None):
        sd = {
            "input_emb.weight": W(hid, inp), "input_emb.bias": W(hid),
            "gru.weight_ih_l0": W(3 * hid, hid), "gru.weight_hh_l0": W(3 * hid, hid),
            "gru.bias_ih_l0": W(3 * hid), "gru.bias_hh_l0": W(3 * hid),
            "gru.weight_ih_l0_reverse": W(3 * hid, hid),
            "gru.weight_hh_l0_reverse": W(3 * hid, hid),
            "gru.bias_ih_l0_reverse": W(3 * hid), "gru.bias_hh_l0_reverse": W(3 * hid),
            "hidden": W(2, 1, hid),
            "output_net.0.weight": W(out_hid, 2 * hid), "output_net.0.bias": W(out_hid),
            "output_net.1.weight": torch.ones(out_hid), "output_net.1.bias": W(out_hid),
            "output_net.3.weight": W(out_in, out_hid), "output_net.3.bias": W(out_in),
        }
        if pos is not None:
            sd["pos_emb.weight"] = W(pos[1], pos[0])
            sd["pos_emb.bias"] = W(pos[1])
        return sd

    blob = {
        "movement_encoder": mov,
        "motion_encoder": bigru(512, 1024, 512, 1024),
        "text_encoder": bigru(300, 512, 512, 512, pos=(15, 300)),
    }
    torch.save(blob, t / "finest.tar")


def _fake_model_pt(root, reference_path):
    """Tiny REAL reference MDM_UNET → {'model','model_avg'} .pt + args.json."""
    import torch

    from test_pipeline_golden import _stub_reference_deps

    _stub_reference_deps()
    import model.mdm_unet as ref_mdm_unet

    class _DummyRot2xyz:
        def __init__(self, *a, **k):
            self.smpl_model = torch.nn.Module()

    orig_rot = ref_mdm_unet.Rotation2xyz
    ref_mdm_unet.Rotation2xyz = _DummyRot2xyz
    try:
        torch.manual_seed(0)
        ref = ref_mdm_unet.MDM_UNET(
            modeltype="", njoints=263, nfeats=1, num_actions=1,
            translation=True, pose_rep="rot6d", glob=True, glob_rot=True,
            latent_dim=16, dim_mults=(1, 2), attention=False,
            data_rep="hml_vec", dataset="humanml", adagn=True, zero=True,
            arch="unet", keyframe_conditioned=True,
        )
        ref.eval()
    finally:
        ref_mdm_unet.Rotation2xyz = orig_rot
    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    mdir = root / "save" / "condmdi_randomframes"
    mdir.mkdir(parents=True)
    torch.save({"model": sd, "model_avg": sd}, mdir / "model000750000.pt")
    (mdir / "args.json").write_text(json.dumps(dict(
        arch="unet", latent_dim=16, dim_mults=[1, 2], diffusion_steps=8,
        keyframe_conditioned=True, abs_3d=True, num_frames=32,
        unet_adagn=True, unet_zero=True,
        # the mocked reference net is built cond_mode-free (a text-cond
        # build would pull real CLIP at init); asset-day models carry text
        unconstrained=True,
    )))


def _fake_humanml_tree(root):
    from test_real_file_datasets import _write_hml_tree

    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset

    d = root / "dataset" / "HumanML3D"
    lines = ["a person walks#a/DET person/NOUN walks/VERB##"]
    N = 36  # ≥ the protocol's fixed batch of 32
    clips = {f"{i:06d}": (64, lines, 263) for i in range(N)}
    _write_hml_tree(d, clips)
    # real-codec features (raw noise NaNs out in the abs↔rel round trips);
    # write both the relative and the abs-root variants like the prepared
    # HumanML3D tree
    feats_rel = SyntheticMotionDataset._make_items(
        DatasetConfig(abs_3d=False), seed=3, size=N, T=65
    )
    feats_abs = SyntheticMotionDataset._make_items(
        DatasetConfig(abs_3d=True), seed=3, size=N, T=65
    )
    (d / "new_joint_vecs_abs_3d").mkdir()
    for i in range(N):
        np.save(d / "new_joint_vecs" / f"{i:06d}.npy", feats_rel[i])
        np.save(d / "new_joint_vecs_abs_3d" / f"{i:06d}.npy", feats_abs[i])
    (d / "test.txt").write_text("\n".join(f"{i:06d}" for i in range(N)) + "\n")

    # Mean/Std asset files: use the synthetic-population stats (identity
    # stats would denormalize a weak model's samples to all-zero features,
    # which NaN out in the quaternion math of the abs↔rel round trips)
    import condmdi_tpu.data as data_pkg

    pkg = root / "dataset"
    (pkg / "HumanML3D_abs").mkdir()
    zr = np.load(Path(data_pkg.__file__).parent / "synthetic_stats_rel.npz")
    za = np.load(Path(data_pkg.__file__).parent / "synthetic_stats_abs.npz")
    np.save(d / "Mean.npy", zr["mean"])
    np.save(d / "Std.npy", zr["std"])
    np.save(pkg / "t2m_mean.npy", zr["mean"])
    np.save(pkg / "t2m_std.npy", zr["std"])
    np.save(pkg / "HumanML3D_abs" / "Mean_abs_3d.npy", za["mean"])
    np.save(pkg / "HumanML3D_abs" / "Std_abs_3d.npy", za["std"])


class TestParityRehearsal:
    def test_end_to_end_on_mocks(self, tmp_path, monkeypatch, reference_path):
        _fake_glove(tmp_path)
        _fake_finest_tar(tmp_path)
        _fake_model_pt(tmp_path, reference_path)
        _fake_humanml_tree(tmp_path)
        monkeypatch.chdir(tmp_path)

        from condmdi_tpu.evals.parity import main

        out = main([
            "--eval_mode", "debug",
            "--num_samples", "32",
            "--output_dir", str(tmp_path / "out"),
        ])
        # all expected values are nulls in the committed template → the
        # rehearsal completes and reports blocked_expected, never crashes
        assert out["status"] == "blocked_expected", out["status"]
        assert (tmp_path / "out" / "parity_report.json").exists()
        report = json.loads((tmp_path / "out" / "parity_report.json").read_text())
        assert "fid" in report["summary_keys"]

    def test_wo_mm_protocol_from_converted_checkpoint(
        self, tmp_path, monkeypatch, reference_path
    ):
        """VERDICT r4 task 9: asset day must produce a reference-comparable
        wo_mm protocol report from the converted reference .pt in ONE
        command — not just the debug-mode smoke above. Asserts the report
        carries the full repro surface (per_replication, params_fingerprint,
        replication-level conf intervals) so it would bind to
        tests/test_report_repro.py's scheme the day it is committed."""
        _fake_glove(tmp_path)
        _fake_finest_tar(tmp_path)
        _fake_model_pt(tmp_path, reference_path)
        _fake_humanml_tree(tmp_path)
        monkeypatch.chdir(tmp_path)

        from condmdi_tpu.evals.parity import main

        out = main([
            "--eval_mode", "wo_mm",
            "--num_samples", "32",
            "--max_replications", "2",
            "--output_dir", str(tmp_path / "out"),
        ])
        assert out["status"] == "blocked_expected", out["status"]
        report_path = tmp_path / "out" / "eval_benchmark_sparse_wo_mm.json"
        assert report_path.exists(), list((tmp_path / "out").iterdir())
        report = json.loads(report_path.read_text())
        meta = report["meta"]
        assert meta["eval_mode"] == "wo_mm"
        assert meta["model_path"].endswith("model000750000.pt")
        assert meta["params_fingerprint"], "converted .pt must fingerprint"
        assert meta["replications"] == 2
        assert "per_replication" in report
        # protocol metrics present with replication-level conf intervals
        for key in ("fid", "keyframe_error", "traj_error", "diversity",
                    "r_precision", "matching_score", "skating_ratio"):
            assert key in report and "conf" in report[key], key

    def test_compare_logic(self):
        from condmdi_tpu.evals.parity import compare

        summary = {"fid": {"mean": [0.25]}, "keyframe_error": {"mean": [0.10]}}
        expected = {"fid": 0.26, "keyframe_error": None, "_instructions": "x"}
        rows = compare(summary, expected)
        by_key = {r[0]: r for r in rows}
        assert by_key["fid"][4] is True  # within 15%
        assert by_key["keyframe_error"][4] is None  # unfilled template
        rows2 = compare({"fid": {"mean": [0.50]}}, {"fid": 0.26})
        assert rows2[0][4] is False
