"""End-to-end evaluation-harness test on synthetic data + tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestEvalHarness:
    @pytest.fixture(scope="class")
    def setup(self):
        from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate
        from condmdi_tpu.diffusion import (
            DiffusionConfig,
            DiffusionSchedule,
            get_named_beta_schedule,
        )
        from condmdi_tpu.diffusion.sampling import SamplerConfig
        from condmdi_tpu.evals.evaluator import EvaluatorWrapper
        from condmdi_tpu.models.text import HashTextEncoder
        from condmdi_tpu.models.unet import MDM_UNET
        from condmdi_tpu.sampling.pipeline import SamplePipeline

        T, B = 48, 4
        ds_rel = SyntheticMotionDataset(
            DatasetConfig(max_motion_length=T, abs_3d=False), size=8, seed=5
        )
        ds_abs = SyntheticMotionDataset(
            DatasetConfig(max_motion_length=T, abs_3d=True), size=8, seed=5
        )
        enc = HashTextEncoder()
        batches = [
            collate([ds_rel[i] for i in range(B)], T, enc),
            collate([ds_rel[i + B] for i in range(B)], T, enc),
        ]
        for b in batches:
            b["tokens"] = [["a/DET", "person/NOUN", "walks/VERB"]] * B

        model = MDM_UNET(
            njoints=263, latent_dim=16, dim_mults=(1, 2), keyframe_conditioned=True,
            pad_frames_to=T, zero=False,
        )
        x = jnp.zeros((B, T, 263))
        t0 = jnp.zeros((B,), jnp.int32)
        y = {"text_embed": jnp.zeros((B, 512))}
        params = model.init(
            jax.random.key(0), x, t0, y,
            obs_x0=x, obs_mask=jnp.zeros((B, T, 263), bool),
        )
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 8))

        def apply_fn(x, t, yy, **kw):
            return model.apply(params, x, t, yy, **kw)

        pipe = SamplePipeline(apply_fn, sched, DiffusionConfig(), SamplerConfig())
        return dict(
            batches=batches, pipe=pipe,
            rel_stats=ds_rel.stats, abs_stats=ds_abs.stats,
        )

    @pytest.mark.slow
    def test_full_evaluation_loop(self, setup, tmp_path):
        from condmdi_tpu.data.word_vectorizer import HashWordVectorizer
        from condmdi_tpu.evals.evaluator import EvaluatorWrapper
        from condmdi_tpu.evals.harness import EvalConfig, evaluation, generate_eval_batch

        cfg = EvalConfig(
            edit_mode="benchmark_sparse", transition_length=10,
            replication_times=2, diversity_times=4, guidance_param=1.0,
            max_frames=48, batch_size=4,
        )
        evaluator = EvaluatorWrapper.random_init(0)

        def generate_fn(rep):
            return [
                generate_eval_batch(
                    setup["pipe"], b, jax.random.key(1000 + rep * 10 + i), cfg,
                    setup["abs_stats"], setup["rel_stats"],
                )
                for i, b in enumerate(setup["batches"])
            ]

        summary = evaluation(
            evaluator, setup["batches"], generate_fn, cfg, HashWordVectorizer(),
            log_file=str(tmp_path / "eval.json"),
        )
        assert set(summary) >= {
            "matching_score", "r_precision", "fid", "diversity",
            "traj_error", "keyframe_error", "skating_ratio",
        }
        assert np.isfinite(summary["fid"]["mean"])
        assert np.isfinite(summary["keyframe_error"]["mean"])
        assert len(summary["traj_error"]["mean"]) == 5
        assert (tmp_path / "eval.json").exists()

    def test_kps_error_semantics(self):
        from condmdi_tpu.evals.harness import compute_kps_error

        B, T = 2, 20
        gt = np.zeros((B, T, 22, 3), np.float32)
        cur = gt.copy()
        cur[0, 5, :, 0] += 0.3  # 30cm x-offset on all joints at frame 5
        mask = np.zeros((B, T), bool)
        mask[:, 5] = True
        mask[:, 10] = True
        err, nk = compute_kps_error(cur, gt, mask, traj_only=True)
        np.testing.assert_array_equal(nk, [2, 2])
        np.testing.assert_allclose(err[0, 0], 0.3, atol=1e-6)
        np.testing.assert_allclose(err[0, 1], 0.0, atol=1e-6)
        np.testing.assert_allclose(err[1], 0.0, atol=1e-6)

    @pytest.mark.slow
    def test_multimodality_path(self, setup):
        from condmdi_tpu.data.word_vectorizer import HashWordVectorizer
        from condmdi_tpu.evals.evaluator import EvaluatorWrapper
        from condmdi_tpu.evals.harness import EvalConfig, evaluation, generate_eval_batch

        cfg = EvalConfig(
            edit_mode="uncond", replication_times=1, diversity_times=4,
            guidance_param=1.0, max_frames=48, batch_size=4,
            run_mm=True, mm_num_times=2,
        )
        evaluator = EvaluatorWrapper.random_init(0)

        def gen(rep):
            return [
                generate_eval_batch(
                    setup["pipe"], b, jax.random.key(rep * 7 + i), cfg,
                    setup["abs_stats"], setup["rel_stats"],
                )
                for i, b in enumerate(setup["batches"][:1])
            ]

        def gen_mm(rep):
            return [gen(100 + r) for r in range(3)]

        summary = evaluation(
            evaluator, setup["batches"][:1], gen, cfg, HashWordVectorizer(),
            generate_mm_fn=gen_mm,
        )
        assert "multimodality" in summary
        assert np.isfinite(summary["multimodality"]["mean"])

    @pytest.mark.slow
    def test_sample_caching(self, setup, tmp_path):
        from condmdi_tpu.evals.harness import EvalConfig, generate_eval_batch

        cfg = EvalConfig(edit_mode="benchmark_sparse", transition_length=10,
                         guidance_param=1.0, max_frames=48, batch_size=4)
        cp = str(tmp_path / "c" / "b0.npz")
        g1 = generate_eval_batch(
            setup["pipe"], setup["batches"][0], jax.random.key(5), cfg,
            setup["abs_stats"], setup["rel_stats"], cache_path=cp,
        )
        import os
        assert os.path.exists(cp)
        g2 = generate_eval_batch(
            setup["pipe"], setup["batches"][0], jax.random.key(999), cfg,
            setup["abs_stats"], setup["rel_stats"], cache_path=cp,
        )
        np.testing.assert_allclose(g1.motions_rel, g2.motions_rel, atol=1e-6)
