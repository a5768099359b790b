"""End-to-end CLI smoke tests (tiny models, few diffusion steps, CPU)."""

import numpy as np
import pytest



pytestmark = pytest.mark.slow  # protocol/e2e scale; fast gate skips

def _common(tmp_path, extra):
    return [
        "--diffusion_steps", "8",
        "--num_frames", "28",
        "--latent_dim", "32",
        "--ff_size", "64",
        "--layers", "2",
        "--num_samples", "2",
        "--num_repetitions", "1",
        "--output_dir", str(tmp_path / "out"),
        "--abs_3d", "true",
    ] + extra


class TestSynthesize:
    def test_text_to_motion(self, tmp_path):
        from condmdi_tpu.sampling.synthesize import main

        out = main(_common(tmp_path, ["--text_prompt", "a person waves", "--motion_length", "1.4"]))
        res = np.load(out / "results.npy", allow_pickle=True).item()
        assert res["motion"].shape == (2, 28, 263)
        assert res["joints"].shape == (2, 28, 22, 3)
        assert np.isfinite(res["joints"]).all()


class TestConditional:
    def test_benchmark_sparse(self, tmp_path):
        from condmdi_tpu.sampling.conditional import main

        out = main(
            _common(tmp_path, [
                "--arch", "unet",
                "--dim_mults", "1", "2",
                "--edit_mode", "benchmark_sparse",
                "--transition_length", "10",
                "--guidance_param", "1.0",
            ])
        )
        res = np.load(out / "results.npy", allow_pickle=True).item()
        assert res["motion"].shape == (2, 28, 263)
        assert res["observed_mask"].shape == (2, 28, 263)
        assert res["observed_mask"].any()

    def test_with_imputation_and_recg(self, tmp_path):
        from condmdi_tpu.sampling.conditional import main

        out = main(
            _common(tmp_path, [
                "--arch", "unet",
                "--dim_mults", "1", "2",
                "--edit_mode", "gmd_keyframes",
                "--imputate", "true",
                "--reconstruction_guidance", "true",
                "--guidance_param", "1.0",
            ])
        )
        res = np.load(out / "results.npy", allow_pickle=True).item()
        assert np.isfinite(res["motion"]).all()


class TestEdit:
    def test_inbetweening_on_uncond_model(self, tmp_path):
        from condmdi_tpu.sampling.edit import main

        out = main(
            _common(tmp_path, [
                "--edit_mode", "benchmark_clip",
                "--transition_length", "10",
                "--imputate", "true",
            ])
        )
        res = np.load(out / "results.npy", allow_pickle=True).item()
        assert res["motion"].shape == (2, 28, 263)
        # imputation keeps observed entries of the (normalized) input
        m = res["inpainting_mask"][0]
        np.testing.assert_allclose(
            res["motion"][0][m], res["inpainted_motion"][0][m], atol=1e-3
        )
