"""Viz rendering + serving warmup + fixed-dataset CLI path."""

import numpy as np
import pytest


class TestViz:
    def test_plot_3d_motion_writes_file(self, tmp_path):
        from condmdi_tpu.viz.plot import plot_3d_motion

        rng = np.random.default_rng(0)
        joints = rng.standard_normal((6, 22, 3)).astype(np.float32) * 0.3
        out = plot_3d_motion(tmp_path / "m.mp4", joints, title="test", fps=5,
                             gt_frames=[0, 2])
        assert out.exists() and out.stat().st_size > 0

    def test_plot_conditional_samples_grid(self, tmp_path):
        from condmdi_tpu.viz.plot import plot_conditional_samples

        rng = np.random.default_rng(1)
        joints = rng.standard_normal((2, 4, 22, 3)).astype(np.float32) * 0.3
        obs = np.zeros((2, 4), bool)
        obs[:, 1] = True
        paths = plot_conditional_samples(joints, obs, tmp_path, texts=["a", "b"])
        assert len(paths) == 2 and all(p.exists() for p in paths)


@pytest.mark.slow
class TestServingWarmup:
    def test_warmup_compiles_buckets(self):
        import jax
        import jax.numpy as jnp

        from condmdi_tpu.diffusion import (
            DiffusionConfig, DiffusionSchedule, get_named_beta_schedule,
        )
        from condmdi_tpu.diffusion.sampling import SamplerConfig
        from condmdi_tpu.models.unet import MDM_UNET
        from condmdi_tpu.sampling.pipeline import SamplePipeline
        from condmdi_tpu.serving import MotionServer

        T, F = 28, 263
        model = MDM_UNET(njoints=F, latent_dim=8, dim_mults=(1, 2),
                         keyframe_conditioned=True, pad_frames_to=T, zero=False)
        x = jnp.zeros((1, T, F))
        params = model.init(
            jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
            {"text_embed": jnp.zeros((1, 512))},
            obs_x0=x, obs_mask=jnp.zeros((1, T, F), bool),
        )
        pipe = SamplePipeline(
            lambda a, b, c, **kw: model.apply(params, a, b, c, **kw),
            DiffusionSchedule.create(get_named_beta_schedule("cosine", 3)),
            DiffusionConfig(), SamplerConfig(),
        )
        srv = MotionServer(pipe, T, F, max_batch=2)
        try:
            srv.warmup(buckets=(1, 2))
            assert set(srv._compiled) == {1, 2}
        finally:
            srv.shutdown()


@pytest.mark.slow
class TestFixedDatasetCLI:
    def test_conditional_with_fixed_dataset(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from condmdi_tpu.sampling.conditional import main

        out = main([
            "--diffusion_steps", "4", "--num_frames", "28", "--latent_dim", "16",
            "--arch", "unet", "--dim_mults", "1", "2",
            "--edit_mode", "benchmark_sparse", "--transition_length", "10",
            "--guidance_param", "1.0", "--num_samples", "2",
            "--num_repetitions", "1", "--abs_3d", "true",
            "--use_fixed_dataset", "true",
            "--output_dir", str(tmp_path / "out"),
        ])
        res = np.load(out / "results.npy", allow_pickle=True).item()
        assert res["motion"].shape == (2, 28, 263)
        # the fixture persists for reproducibility
        assert (tmp_path / "save/fixed_dataset/humanml_abs3d.npz").exists()
