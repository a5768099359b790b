"""Training loop tests: loss decreases, EMA, keyframe conditioning,
loss-aware sampler, and data-parallel sharding over the virtual 8-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.diffusion import DiffusionConfig, DiffusionSchedule, get_named_beta_schedule
from condmdi_tpu.diffusion.resample import LossAwareState
from condmdi_tpu.models import MDM
from condmdi_tpu.parallel import make_mesh, replicate, shard_batch
from condmdi_tpu.training import TrainConfig, create_train_state, make_train_step

B, T, F = 8, 24, 263
STEPS = 20


def make_batch(rng):
    motion = rng.standard_normal((B, T, F)).astype(np.float32) * 0.1
    lengths = np.full((B,), T, np.int32)
    lengths[1] = T - 6
    time_mask = np.arange(T)[None, :] < lengths[:, None]
    return {
        "motion": jnp.asarray(motion),
        "time_mask": jnp.asarray(time_mask),
        "lengths": jnp.asarray(lengths),
        "text_embed": jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32)),
    }


def setup(tcfg=None, **model_kw):
    model = MDM(njoints=F, latent_dim=32, ff_size=64, num_layers=1, num_heads=2, **model_kw)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = model.init(
        jax.random.key(0), batch["motion"], jnp.zeros((B,), jnp.int32),
        {"text_embed": batch["text_embed"]},
    )
    sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", STEPS))
    dcfg = DiffusionConfig()
    tcfg = tcfg or TrainConfig(lr=1e-3, num_steps=10)
    state = create_train_state(params, tcfg, sched)

    def apply_fn(params, x, t, y, train=False, rngs=None, **kw):
        return model.apply(params, x, t, y, train=train, rngs=rngs, **kw)

    step_fn = make_train_step(apply_fn, sched, dcfg, tcfg)
    return model, state, step_fn, batch


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases(self):
        _, state, step_fn, batch = setup()
        losses = []
        for i in range(15):
            state, metrics = step_fn(state, batch, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 15

    @pytest.mark.slow
    def test_ema_tracks_params(self):
        tcfg = TrainConfig(lr=1e-3, avg_model_beta=0.5)
        _, state, step_fn, batch = setup(tcfg=tcfg)
        p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
        for i in range(3):
            state, _ = step_fn(state, batch, jax.random.key(i))
        leaves_p = jax.tree_util.tree_leaves(state.params)
        leaves_e = jax.tree_util.tree_leaves(state.ema_params)
        # EMA differs from both initial and current params but is finite
        assert not np.allclose(np.asarray(leaves_p[0]), np.asarray(leaves_e[0]))
        assert np.isfinite(np.asarray(leaves_e[0])).all()

    @pytest.mark.slow
    def test_keyframe_conditioned_training(self):
        tcfg = TrainConfig(
            lr=1e-3, keyframe_conditioned=True,
            keyframe_selection_scheme="random_frames", keyframe_mask_prob=0.1,
        )
        # MDM doesn't take obs kwargs; use a wrapper closure faking a
        # keyframe-conditioned model by ignoring obs via lambda — use UNET
        from condmdi_tpu.models import MDM_UNET

        model = MDM_UNET(
            njoints=F, latent_dim=16, dim_mults=(1, 2),
            keyframe_conditioned=True, pad_frames_to=24, zero=False,
        )
        rng = np.random.default_rng(0)
        batch = make_batch(rng)
        params = model.init(
            jax.random.key(0), batch["motion"], jnp.zeros((B,), jnp.int32),
            {"text_embed": batch["text_embed"]},
            obs_x0=batch["motion"], obs_mask=jnp.zeros((B, T, F), bool),
        )
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", STEPS))
        state = create_train_state(params, tcfg, sched)

        def apply_fn(params, x, t, y, train=False, rngs=None, **kw):
            return model.apply(params, x, t, y, train=train, rngs=rngs, **kw)

        step_fn = make_train_step(apply_fn, sched, DiffusionConfig(), tcfg)
        state, metrics = step_fn(state, batch, jax.random.key(1))
        assert "keyframes_mse" in metrics
        assert np.isfinite(float(metrics["loss"]))

    @pytest.mark.slow
    def test_loss_aware_sampler(self):
        tcfg = TrainConfig(lr=1e-3, schedule_sampler="loss-second-moment")
        _, state, step_fn, batch = setup(tcfg=tcfg)
        assert state.loss_aware is not None
        for i in range(3):
            state, _ = step_fn(state, batch, jax.random.key(i))
        assert int(state.loss_aware.counts.sum()) == 3 * B


class TestLossAwareState:
    def test_fifo_history(self):
        s = LossAwareState.create(4, history_per_term=3)
        for i in range(5):
            s = s.update(jnp.asarray([1]), jnp.asarray([float(i)]))
        np.testing.assert_allclose(np.asarray(s.history[1]), [2.0, 3.0, 4.0])
        assert int(s.counts[1]) == 3

    def test_weights_uniform_until_warm(self):
        s = LossAwareState.create(4, history_per_term=2)
        w = np.asarray(s.weights())
        np.testing.assert_allclose(w, 0.25)
        for t in range(4):
            for i in range(2):
                s = s.update(jnp.asarray([t]), jnp.asarray([1.0 + t]))
        w = np.asarray(s.weights())
        assert w[3] > w[0]  # larger losses → larger weight
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)


@pytest.mark.slow
class TestRemat:
    def test_remat_step_matches_plain(self):
        """jax.checkpoint on the denoiser must not change the math."""
        _, state, step_fn, batch = setup()
        s1, m1 = step_fn(state, batch, jax.random.key(0))

        model, state2, _, _ = setup()
        tcfg = TrainConfig(lr=1e-3, num_steps=10, remat=True)
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", STEPS))

        def apply_fn(params, x, t, y, train=False, rngs=None, **kw):
            return model.apply(params, x, t, y, train=train, rngs=rngs, **kw)

        step_r = make_train_step(apply_fn, sched, DiffusionConfig(), tcfg)
        s2, m2 = step_r(state2, batch, jax.random.key(0))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        # Adam's first step amplifies recompute-order roundoff (update is
        # ~sign(g)·lr when v≈g²), so params agree to ~lr·1e-1, not 1e-5.
        for l1, l2 in zip(
            jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
        ):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=5e-4)


class TestDataParallel:
    def test_sharded_train_step_matches_single_device(self):
        assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
        # state is donated into the step, so build a fresh one per run
        _, state, step_fn, batch = setup()
        s1, m1 = step_fn(state, batch, jax.random.key(0))

        _, state2, _, _ = setup()
        mesh = make_mesh()
        state_r = replicate(mesh, state2)
        batch_s = shard_batch(mesh, batch)
        s8, m8 = step_fn(state_r, batch_s, jax.random.key(0))
        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=2e-4
        )
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        l8 = jax.tree_util.tree_leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), atol=2e-4)


@pytest.mark.slow
class TestFSDP:
    def test_fsdp_sharded_step_matches_replicated(self):
        from condmdi_tpu.parallel import make_mesh, replicate, shard_batch, shard_params_fsdp
        import dataclasses

        _, state, step_fn, batch = setup()
        mesh = make_mesh()
        s_rep = replicate(mesh, state)
        b = shard_batch(mesh, batch)
        r1, m1 = step_fn(s_rep, b, jax.random.key(0))

        _, state2, _, _ = setup()
        s_fsdp = dataclasses.replace(
            replicate(mesh, state2),
            params=shard_params_fsdp(mesh, state2.params, min_size=1024),
            ema_params=shard_params_fsdp(mesh, state2.ema_params, min_size=1024),
        )
        r2, m2 = step_fn(s_fsdp, b, jax.random.key(0))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)


@pytest.mark.slow
class TestTensorParallel:
    def test_tp_sharded_step_matches_single_device(self):
        """Megatron-style dp×tp layout: same loss + same updated params as
        the unsharded step (XLA inserts the tp all-reduces)."""
        import dataclasses

        from condmdi_tpu.parallel import make_mesh_2d, shard_batch, shard_params_tp

        _, state, step_fn, batch = setup()
        s1, m1 = step_fn(state, batch, jax.random.key(0))

        _, state2, _, _ = setup()
        mesh = make_mesh_2d(n_dp=4, n_tp=2)
        assert mesh.shape == {"dp": 4, "tp": 2}
        from condmdi_tpu.parallel import replicate
        s_tp = dataclasses.replace(
            replicate(mesh, state2),
            params=shard_params_tp(mesh, state2.params),
            ema_params=shard_params_tp(mesh, state2.ema_params),
        )
        b = shard_batch(mesh, batch)
        s2, m2 = step_fn(s_tp, b, jax.random.key(0))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
        for l1, l2 in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s2.params),
        ):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=3e-4)

    def test_tp_rules_hit_transformer_leaves(self):
        from condmdi_tpu.parallel import make_mesh_2d, shard_params_tp

        _, state, _, _ = setup()
        mesh = make_mesh_2d(n_dp=4, n_tp=2)
        sharded = shard_params_tp(mesh, state.params)
        qkv = sharded["params"]["layer0"]["qkv"]["kernel"]
        ff2 = sharded["params"]["layer0"]["ff2"]["kernel"]
        out = sharded["params"]["output_process"]["kernel"]
        assert "tp" in str(qkv.sharding.spec)
        assert "tp" in str(ff2.sharding.spec)
        # non-transformer leaves replicated
        assert "tp" not in str(out.sharding.spec)
