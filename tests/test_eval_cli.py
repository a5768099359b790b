"""Eval CLI smoke test (synthetic data, tiny model, debug mode)."""

import numpy as np


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
