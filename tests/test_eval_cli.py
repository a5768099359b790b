"""Eval CLI smoke test (synthetic data, tiny model, debug mode)."""

import numpy as np



import pytest

pytestmark = pytest.mark.slow  # protocol/e2e scale; fast gate skips

class TestEvalCLI:
    def test_debug_eval_runs(self, tmp_path):
        from condmdi_tpu.evals.run import main

        summary = main([
            "--eval_mode", "debug",
            "--diffusion_steps", "4",
            "--num_frames", "32",
            "--latent_dim", "16",
            "--arch", "unet",
            "--dim_mults", "1", "2",
            "--edit_mode", "benchmark_sparse",
            "--transition_length", "10",
            "--guidance_param", "1.0",
            "--num_samples", "32",
            "--abs_3d", "true",
            "--model_path", "",
            "--output_dir", str(tmp_path),
        ])
        assert np.isfinite(summary["fid"]["mean"])
        assert np.isfinite(summary["keyframe_error"]["mean"])

    def test_debug_eval_int8_static(self, tmp_path):
        """The FULL protocol runs with the int8_static sampler (VERDICT r3
        #3b: promote int8 on whole-protocol metric deltas). Calibration uses
        the shared quant.calibrate_act_scales path."""
        import json
        from pathlib import Path

        from condmdi_tpu.evals.run import main

        summary = main([
            "--eval_mode", "debug",
            "--max_replications", "1",
            "--diffusion_steps", "4",
            "--num_frames", "32",
            "--latent_dim", "16",
            "--arch", "unet",
            "--dim_mults", "1", "2",
            "--edit_mode", "benchmark_sparse",
            "--precision_mode", "int8_static",
            "--num_samples", "32",
            "--abs_3d", "true",
            "--model_path", "",
            "--output_dir", str(tmp_path),
        ])
        assert np.isfinite(summary["fid"]["mean"])
        assert np.isfinite(summary["keyframe_error"]["mean"])
        report = json.loads(
            Path(tmp_path, "eval_benchmark_sparse_debug_int8_static.json").read_text()
        )
        assert report["meta"]["precision_mode"] == "int8_static"


class TestLegacyT2MProtocol:
    """eval_humanml (MDM-style text-only) protocol end-to-end
    (reference eval/eval_humanml.py:166-292)."""

    def test_debug_eval_runs(self, tmp_path):
        import json
        from pathlib import Path

        from condmdi_tpu.evals.run_t2m import main

        summary = main([
            "--eval_mode", "debug",
            "--diffusion_steps", "4",
            "--num_frames", "32",
            "--latent_dim", "16",
            "--ff_size", "32",
            "--layers", "1",
            "--guidance_param", "2.5",
            "--num_samples", "32",
            "--model_path", "",
            "--text_encoder", "hash",
            # write to tmp — the default save/eval_out would clobber the
            # committed round-4 debug artifacts on every suite run
            "--output_dir", str(tmp_path),
        ])
        assert np.isfinite(summary["fid"]["mean"])
        assert np.isfinite(summary["matching_score"]["mean"])
        assert len(summary["r_precision"]["mean"]) == 3
        # the legacy protocol has NO keyframe metrics
        assert "keyframe_error" not in summary
        assert "traj_error" not in summary
        report = json.loads(
            (Path(tmp_path) / "eval_humanml_debug.json").read_text()
        )
        assert report["meta"]["protocol"].startswith("eval_humanml")
        assert report["meta"]["synthetic_data"] is True


class TestGMDConditionProtocol:
    """eval_humanml_condition (GMD two-stage) protocol end-to-end
    (reference eval/eval_humanml_condition.py:22-112)."""

    def test_debug_eval_runs(self, tmp_path):
        import json
        from pathlib import Path

        from condmdi_tpu.evals.run_condition import main

        summary = main([
            "--eval_mode", "debug",
            "--diffusion_steps", "4",
            "--num_frames", "32",
            "--latent_dim", "16",
            "--arch", "unet",
            "--dim_mults", "1", "2",
            "--num_samples", "32",
            "--model_path", "",
            "--text_encoder", "hash",
            "--output_dir", str(tmp_path),
        ])
        assert np.isfinite(summary["fid"]["mean"])
        # trajectory-error vector: [traj_fail_20cm, traj_fail_50cm,
        # kps_fail_20cm, kps_fail_50cm, kps_mean_err]
        assert len(summary["traj_error"]["mean"]) == 5
        assert np.isfinite(summary["keyframe_error"]["mean"])
        report = json.loads(
            (Path(tmp_path) / "eval_condition_debug.json").read_text()
        )
        assert report["meta"]["random_init_models"] is True
        assert "two-stage" in report["meta"]["protocol"]


class TestA2MProtocol:
    """eval_humanact12_uestc protocol entry (reference :18) asset-free."""

    def test_debug_a2m_runs(self, tmp_path):
        import json
        from pathlib import Path

        from condmdi_tpu.evals.run_a2m import main

        summary = main([
            "--eval_mode", "debug",
            "--diffusion_steps", "4",
            "--num_samples", "16",
            "--batch_size", "16",
            "--num_frames", "24",
            "--latent_dim", "32",
            "--layers", "1",
            "--output_dir", str(tmp_path),
        ])
        assert np.isfinite(summary["fid"]["mean"])
        assert 0.0 <= np.ravel(summary["accuracy"]["mean"])[0] <= 1.0
        blob = json.loads(
            (Path(tmp_path) / "eval_a2m_humanact12_debug.json").read_text()
        )
        assert blob["meta"]["protocol"] == "a2m"
        assert blob["meta"]["synthetic_data"] is True
        assert blob["meta"]["classifier"] == "random_init"

    def test_debug_uestc_branch(self, tmp_path):
        from condmdi_tpu.evals.run_a2m import main

        summary = main([
            "--dataset", "uestc",
            "--eval_mode", "debug",
            "--diffusion_steps", "2",
            "--num_samples", "8",
            "--batch_size", "8",
            "--num_frames", "16",
            "--latent_dim", "16",
            "--layers", "1",
            "--output_dir", str(tmp_path),
        ])
        assert np.isfinite(summary["fid"]["mean"])


class TestUnconstrainedProtocol:
    """eval/unconstrained/evaluate.py protocol entry asset-free."""

    def test_debug_unconstrained_runs(self, tmp_path):
        import json
        from pathlib import Path

        from condmdi_tpu.evals.run_unconstrained import main

        summary = main([
            "--eval_mode", "debug",
            "--diffusion_steps", "4",
            "--num_samples", "16",
            "--batch_size", "16",
            "--num_frames", "24",
            "--latent_dim", "32",
            "--layers", "1",
            "--kid_subsets", "3",
            "--output_dir", str(tmp_path),
        ])
        for k in ("fid", "kid", "precision", "recall", "diversity"):
            assert np.isfinite(summary[k]["mean"]), k
        blob = json.loads(
            (Path(tmp_path) / "eval_unconstrained_debug.json").read_text()
        )
        assert blob["meta"]["protocol"] == "unconstrained"
        assert blob["meta"]["features"] == "stgcn_smpl_rot6d"
