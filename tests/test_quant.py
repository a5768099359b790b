"""Int8 quantized conv: numeric closeness + params-tree conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.ops.quant import (
    conv1d_f32,
    int8_conv1d,
    quantize_activation,
    quantize_params_tree,
    quantize_weight_per_channel,
)

RNG = np.random.default_rng(0)


class TestQuantOps:
    def test_weight_quant_round_trip(self):
        w = jnp.asarray(RNG.standard_normal((5, 16, 32)).astype(np.float32) * 0.1)
        wq, s = quantize_weight_per_channel(w)
        assert wq.dtype == jnp.int8
        deq = wq.astype(jnp.float32) * s
        rel = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.01

    def test_int8_conv_close_to_f32(self):
        x = jnp.asarray(RNG.standard_normal((2, 24, 16)).astype(np.float32))
        w = jnp.asarray(RNG.standard_normal((5, 16, 32)).astype(np.float32) * 0.05)
        b = jnp.asarray(RNG.standard_normal((32,)).astype(np.float32) * 0.1)
        ref = np.asarray(conv1d_f32(x, w, b, padding=2))
        wq, s = quantize_weight_per_channel(w)
        got = np.asarray(int8_conv1d(x, wq, s, b, padding=2))
        rel = np.abs(got - ref).mean() / np.abs(ref).mean()
        assert rel < 0.02, rel

    def test_activation_quant_saturation(self):
        x = jnp.asarray([[100.0, -100.0, 0.5]])
        xq, s = quantize_activation(x)
        assert int(xq.max()) == 127 and int(xq.min()) == -127

    def test_params_tree_conversion(self):
        tree = {
            "block1": {"conv": {"kernel": jnp.zeros((5, 8, 8)) + 0.1, "bias": jnp.zeros(8)}},
            "time_mlp": {"kernel": jnp.zeros((8, 16)), "bias": jnp.zeros(16)},
        }
        q = quantize_params_tree(tree)
        assert "kernel_q" in q["block1"]["conv"]
        assert q["block1"]["conv"]["kernel_q"].dtype == jnp.int8
        # dense kernel untouched
        assert "kernel" in q["time_mlp"]


@pytest.mark.slow
class TestInt8UNet:
    def test_int8_unet_close_to_float(self):
        """Same checkpoint, precision_mode='int8' vs 'float': outputs close."""
        import jax
        import jax.numpy as jnp

        from condmdi_tpu.models.unet import MDM_UNET

        B, T, F = 2, 28, 263
        kw = dict(njoints=F, latent_dim=32, dim_mults=(1, 2),
                  keyframe_conditioned=True, pad_frames_to=28, zero=False)
        m_f = MDM_UNET(**kw)
        m_q = MDM_UNET(**kw, precision_mode="int8")
        x = jax.random.normal(jax.random.key(0), (B, T, F))
        t = jnp.full((B,), 3, jnp.int32)
        y = {"text_embed": jax.random.normal(jax.random.key(1), (B, 512))}
        obs = jax.random.normal(jax.random.key(2), (B, T, F)) * 0.3
        mask = jnp.zeros((B, T, F), bool).at[:, ::5, :].set(True)
        params = m_f.init(jax.random.key(3), x, t, y, obs_x0=obs, obs_mask=mask)

        out_f = np.asarray(m_f.apply(params, x, t, y, obs_x0=obs, obs_mask=mask))
        out_q = np.asarray(m_q.apply(params, x, t, y, obs_x0=obs, obs_mask=mask))
        rel = np.abs(out_q - out_f).mean() / (np.abs(out_f).mean() + 1e-8)
        assert rel < 0.1, rel
        assert np.isfinite(out_q).all()


@pytest.mark.slow
class TestInt8WholeSampler:
    def test_int8_ddim_trajectory_close_to_float(self):
        """The quality gate the FID check will formalize: identical seed +
        deterministic DDIM, float vs int8 model → whole sampled motions stay
        close through all steps (quantization error must not compound)."""
        import jax
        import jax.numpy as jnp

        from condmdi_tpu.diffusion import (
            DiffusionConfig, DiffusionSchedule, get_named_beta_schedule,
        )
        from condmdi_tpu.diffusion.sampling import SamplerConfig
        from condmdi_tpu.models.unet import MDM_UNET
        from condmdi_tpu.sampling.pipeline import SamplePipeline

        B, T, F = 2, 28, 263
        kw = dict(njoints=F, latent_dim=32, dim_mults=(1, 2),
                  keyframe_conditioned=True, pad_frames_to=28, zero=False)
        m_f = MDM_UNET(**kw)
        m_q = MDM_UNET(**kw, precision_mode="int8")
        obs = jax.random.normal(jax.random.key(1), (B, T, F)) * 0.3
        mask = jnp.zeros((B, T, F), bool).at[:, ::7, :].set(True)
        y = {"text_embed": jax.random.normal(jax.random.key(2), (B, 512))}
        params = m_f.init(
            jax.random.key(0), jnp.zeros((B, T, F)), jnp.zeros((B,), jnp.int32),
            y, obs_x0=obs, obs_mask=mask,
        )
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 20))
        scfg = SamplerConfig(method="ddim", eta=0.0)

        outs = {}
        for name, m in (("float", m_f), ("int8", m_q)):
            pipe = SamplePipeline(
                lambda a, b, c, _m=m, **k: _m.apply(params, a, b, c, **k),
                sched, DiffusionConfig(), scfg,
            )
            outs[name] = np.asarray(pipe.sample(
                jax.random.key(3), (B, T, F), y, obs_x0=obs, obs_mask=mask,
            ))
        rel = np.abs(outs["int8"] - outs["float"]).mean() / (
            np.abs(outs["float"]).mean() + 1e-8
        )
        assert rel < 0.25, rel
        assert np.isfinite(outs["int8"]).all()


@pytest.mark.slow
class TestInt8MDM:
    def test_int8_mdm_close_to_float(self):
        import jax
        import jax.numpy as jnp

        from condmdi_tpu.models.mdm import MDM

        B, T, F = 2, 24, 263
        kw = dict(njoints=F, latent_dim=64, ff_size=128, num_layers=2, num_heads=4)
        m_f = MDM(**kw)
        m_q = MDM(**kw, precision_mode="int8")
        x = jax.random.normal(jax.random.key(0), (B, T, F))
        t = jnp.full((B,), 5, jnp.int32)
        y = {"text_embed": jax.random.normal(jax.random.key(1), (B, 512))}
        params = m_f.init(jax.random.key(2), x, t, y)
        out_f = np.asarray(m_f.apply(params, x, t, y))
        out_q = np.asarray(m_q.apply(params, x, t, y))
        rel = np.abs(out_q - out_f).mean() / (np.abs(out_f).mean() + 1e-8)
        assert rel < 0.1, rel


@pytest.mark.slow
class TestInt8StaticScales:
    """Static-activation-scale serving path: calibrate via a mutable
    `act_scale` collection, then serve with zero per-step abs-max reduces
    (the dynamic passes profiled at ~21% of int8 step time — BENCH_NOTES)."""

    def _build(self, mode):
        from condmdi_tpu.models.unet import MDM_UNET

        return MDM_UNET(
            njoints=263, latent_dim=32, dim_mults=(1, 2),
            keyframe_conditioned=True, pad_frames_to=32, precision_mode=mode,
        )

    def test_static_matches_dynamic_on_calibration_inputs(self):
        B, T, F = 2, 28, 263
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
        t = jnp.full((B,), 500, jnp.int32)
        y = {"text_embed": jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))}
        kw = dict(
            obs_x0=jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32) * 0.1),
            obs_mask=jnp.zeros((B, T, F), bool).at[:, ::7, :].set(True),
        )

        mf = self._build("float")
        variables = mf.init(jax.random.key(0), x, t, y, **kw)
        # perturb so zero-init heads produce signal
        leaves, td = jax.tree_util.tree_flatten(variables["params"])
        prng = np.random.default_rng(1)
        leaves = [
            l + jnp.asarray(0.05 * prng.standard_normal(l.shape).astype(np.float32))
            for l in leaves
        ]
        params = {"params": jax.tree_util.tree_unflatten(td, leaves)}

        out_dyn = self._build("int8").apply(params, x, t, y, **kw)

        ms = self._build("int8_static")
        vs = ms.init(jax.random.key(0), x, t, y, **kw)
        variables = {"params": params["params"], "act_scale": vs["act_scale"]}
        # calibration = mutable pass on the same input
        _, upd = ms.apply(variables, x, t, y, **kw, mutable=["act_scale"])
        variables = {"params": params["params"], "act_scale": upd["act_scale"]}
        out_static = ms.apply(variables, x, t, y, **kw)

        # same abs-max scales — but the dynamic path computes them as traced
        # in-graph reduces whose association order differs from the
        # calibration program's, so ulp-level scale differences flip
        # round-to-nearest at quantization boundaries. Assert closeness at
        # the quant-step scale, not bit equality.
        d = np.abs(np.asarray(out_static) - np.asarray(out_dyn))
        rel = d.mean() / (np.abs(np.asarray(out_dyn)).mean() + 1e-9)
        assert rel < 0.05, rel
        # every QConv site calibrated to a nonzero amax
        amaxes = jax.tree_util.tree_leaves(upd["act_scale"])
        assert all(float(a) > 0 for a in amaxes) and len(amaxes) > 0

    def test_static_stays_close_off_calibration(self):
        """On inputs ~half the calibrated range, static quantization loses a
        little resolution but must stay close to the float output."""
        B, T, F = 2, 28, 263
        rng = np.random.default_rng(2)
        x_cal = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
        x_serve = x_cal * 0.5
        t = jnp.full((B,), 100, jnp.int32)
        y = {"text_embed": jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))}
        kw = dict(
            obs_x0=jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32) * 0.1),
            obs_mask=jnp.zeros((B, T, F), bool).at[:, ::7, :].set(True),
        )
        mf = self._build("float")
        variables = mf.init(jax.random.key(0), x_cal, t, y, **kw)
        leaves, td = jax.tree_util.tree_flatten(variables["params"])
        prng = np.random.default_rng(3)
        leaves = [
            l + jnp.asarray(0.05 * prng.standard_normal(l.shape).astype(np.float32))
            for l in leaves
        ]
        params = {"params": jax.tree_util.tree_unflatten(td, leaves)}
        out_f = mf.apply(params, x_serve, t, y, **kw)

        ms = self._build("int8_static")
        vs = ms.init(jax.random.key(0), x_cal, t, y, **kw)
        variables = {"params": params["params"], "act_scale": vs["act_scale"]}
        _, upd = ms.apply(variables, x_cal, t, y, **kw, mutable=["act_scale"])
        variables = {"params": params["params"], "act_scale": upd["act_scale"]}
        out_s = ms.apply(variables, x_serve, t, y, **kw)

        rel = float(
            jnp.abs(out_s - out_f).mean() / (jnp.abs(out_f).mean() + 1e-9)
        )
        assert rel < 0.15, rel


class TestInt8Prequant:
    """Pre-quantized weight serving: int8 weights resident in the param
    tree (quantize_params_tree layout), read directly by
    QConv(precision_mode='int8_prequant') — half the weight traffic of
    bf16 for bandwidth-bound B=1 serving."""

    @pytest.mark.slow  # whole-UNet forward ×3 precision modes (~80 s)
    def test_prequant_matches_dynamic_int8(self):
        from condmdi_tpu.models.unet import MDM_UNET
        from condmdi_tpu.ops.quant import quantize_params_tree

        B, T, F = 2, 28, 263
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
        t = jnp.full((B,), 300, jnp.int32)
        y = {"text_embed": jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))}
        kw = dict(
            obs_x0=jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32) * 0.1),
            obs_mask=jnp.zeros((B, T, F), bool).at[:, ::7, :].set(True),
        )

        def build(mode):
            return MDM_UNET(
                njoints=F, latent_dim=32, dim_mults=(1, 2),
                keyframe_conditioned=True, pad_frames_to=32, precision_mode=mode,
            )

        variables = build("float").init(jax.random.key(0), x, t, y, **kw)
        leaves, td = jax.tree_util.tree_flatten(variables["params"])
        prng = np.random.default_rng(1)
        leaves = [
            l + jnp.asarray(0.05 * prng.standard_normal(l.shape).astype(np.float32))
            for l in leaves
        ]
        fparams = jax.tree_util.tree_unflatten(td, leaves)
        out_dyn = build("int8").apply({"params": fparams}, x, t, y, **kw)

        qtree = quantize_params_tree(fparams)
        mp = build("int8_prequant")
        _, upd = mp.apply({"params": qtree}, x, t, y, **kw, mutable=["act_scale"])
        out_pq = mp.apply({"params": qtree, "act_scale": upd["act_scale"]}, x, t, y, **kw)

        # same int8 weights + same activation scales -> same outputs up to
        # reduce-ordering boundary flips (see TestInt8StaticScales)
        rel = float(
            jnp.abs(out_pq - out_dyn).mean() / (jnp.abs(out_dyn).mean() + 1e-9)
        )
        assert rel < 0.05, rel

        # the point of the exercise: the quantized tree is much smaller
        fb = sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(fparams))
        qb = sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(qtree))
        assert qb < 0.45 * fb, (fb, qb)

        # ConvTranspose upsample kernels stayed float ('kernel', not 'kernel_q')
        flat = jax.tree_util.tree_flatten_with_path(qtree)[0]
        ups = [p for p, _ in flat if any("upsample" in str(k) for k in p)]
        assert ups and all("kernel_q" not in str(p) for p in ups)


class TestTrajectoryCalibration:
    """calibrate_act_scales_trajectory: scales recorded along an actual
    CFG-guided dynamic-int8 sampling trajectory (the serving distribution),
    not q_sample forward marginals (round 4: those clip under CFG
    extrapolation and the 1000-step protocol scan diverged to inf)."""

    def test_records_finite_scales_and_serving_stays_finite(self):
        from condmdi_tpu.diffusion import (
            DiffusionConfig, DiffusionSchedule, get_named_beta_schedule,
        )
        from condmdi_tpu.diffusion.sampling import SamplerConfig
        from condmdi_tpu.models.unet import MDM_UNET
        from condmdi_tpu.ops.quant import calibrate_act_scales_trajectory
        from condmdi_tpu.sampling.pipeline import SamplePipeline

        B, T, F = 2, 32, 263
        model = MDM_UNET(
            njoints=F, latent_dim=32, dim_mults=(1, 2),
            keyframe_conditioned=True, pad_frames_to=32,
            precision_mode="int8_static",
        )
        rng = np.random.default_rng(0)
        x = jnp.zeros((B, T, F))
        y = {"text_embed": jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))}
        obs_x0 = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
        obs_mask = jnp.zeros((B, T, F), bool).at[:, ::8, :].set(True)
        params = model.init(
            jax.random.key(0), x, jnp.zeros((B,), jnp.int32), y,
            obs_x0=obs_x0, obs_mask=obs_mask,
        )
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 12))
        dcfg = DiffusionConfig()

        variables = calibrate_act_scales_trajectory(
            model, params, sched, dcfg, (B, T, F), y,
            guidance_param=2.5, obs_x0=obs_x0, obs_mask=obs_mask,
        )
        leaves = jax.tree_util.tree_leaves(variables["act_scale"])
        assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # CFG-doubled trajectory visited the net: every recorded max > 0
        assert all(float(np.asarray(l).max()) > 0 for l in leaves)

        def apply_fn(xx, tt, yy, **kkw):
            return model.apply(variables, xx, tt, yy, **kkw)

        pipe = SamplePipeline(apply_fn, sched, dcfg, SamplerConfig())
        out = pipe.sample(
            jax.random.key(1), (B, T, F), y, guidance_param=2.5,
            obs_x0=obs_x0, obs_mask=obs_mask,
        )
        assert bool(np.isfinite(np.asarray(out)).all())

    def test_headroom_scales_maxima(self):
        from condmdi_tpu.diffusion import (
            DiffusionConfig, DiffusionSchedule, get_named_beta_schedule,
        )
        from condmdi_tpu.models.unet import MDM_UNET
        from condmdi_tpu.ops.quant import calibrate_act_scales_trajectory

        B, T, F = 2, 32, 263
        model = MDM_UNET(
            njoints=F, latent_dim=16, dim_mults=(1, 2),
            keyframe_conditioned=True, pad_frames_to=32,
            precision_mode="int8_static",
        )
        rng = np.random.default_rng(3)
        y = {"text_embed": jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))}
        obs_x0 = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
        obs_mask = jnp.zeros((B, T, F), bool).at[:, ::8, :].set(True)
        params = model.init(
            jax.random.key(0), jnp.zeros((B, T, F)), jnp.zeros((B,), jnp.int32),
            y, obs_x0=obs_x0, obs_mask=obs_mask,
        )
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 6))
        kw = dict(guidance_param=1.0, obs_x0=obs_x0, obs_mask=obs_mask, seed=4)
        v1 = calibrate_act_scales_trajectory(
            model, params, sched, DiffusionConfig(), (B, T, F), y,
            headroom=1.0, **kw,
        )
        v2 = calibrate_act_scales_trajectory(
            model, params, sched, DiffusionConfig(), (B, T, F), y,
            headroom=2.0, **kw,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(v1["act_scale"]),
            jax.tree_util.tree_leaves(v2["act_scale"]),
        ):
            np.testing.assert_allclose(np.asarray(b), 2.0 * np.asarray(a), rtol=1e-6)


class TestMixedStepServing:
    """int8_float_last_k mixed-step serving (evals.run / bench unet_int8_mixed):
    one params tree drives an int8_static model and a float clone; lax.cond
    picks per sampler step on the model timestep. The cond branches must be
    EXACTLY the single-mode outputs — the mixed path is a scheduler, not a
    third numeric path."""

    def test_cond_branches_match_single_mode_outputs(self):
        from condmdi_tpu.models.unet import MDM_UNET

        B, T, F, K = 2, 28, 263, 100
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
        y = {"text_embed": jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))}
        kw = dict(
            obs_x0=jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32) * 0.1),
            obs_mask=jnp.zeros((B, T, F), bool).at[:, ::7, :].set(True),
        )
        m8 = MDM_UNET(
            njoints=F, latent_dim=32, dim_mults=(1, 2),
            keyframe_conditioned=True, pad_frames_to=32,
            precision_mode="int8_static",
        )
        mf = m8.clone(precision_mode="float")

        t0 = jnp.zeros((B,), jnp.int32)
        vs = m8.init(jax.random.key(0), x, t0, y, **kw)
        leaves, td = jax.tree_util.tree_flatten(vs["params"])
        prng = np.random.default_rng(8)
        leaves = [
            l + jnp.asarray(0.05 * prng.standard_normal(l.shape).astype(np.float32))
            for l in leaves
        ]
        variables = {"params": jax.tree_util.tree_unflatten(td, leaves)}
        _, upd = m8.apply(
            {**variables, "act_scale": vs["act_scale"]}, x, t0, y, **kw,
            mutable=["act_scale"],
        )
        variables = {**variables, "act_scale": upd["act_scale"]}

        @jax.jit
        def mixed(x, t):
            return jax.lax.cond(
                t[0] < K,
                lambda: mf.apply(variables, x, t, y, **kw),
                lambda: m8.apply(variables, x, t, y, **kw),
            )

        t_late = jnp.full((B,), K - 1, jnp.int32)   # float branch
        t_early = jnp.full((B,), K, jnp.int32)      # int8 branch
        # jit-under-cond fuses differently than an eager apply, so the same
        # branch is not bit-identical — but float-vs-int8 differ at the ~5%
        # level, so a 1e-4 tolerance still pins WHICH branch executed
        np.testing.assert_allclose(
            np.asarray(mixed(x, t_late)),
            np.asarray(mf.apply(variables, x, t_late, y, **kw)),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mixed(x, t_early)),
            np.asarray(m8.apply(variables, x, t_early, y, **kw)),
            rtol=1e-4, atol=1e-5,
        )
        # and the two branches genuinely differ well ABOVE the tolerance
        # used to pin branch identity (int8 is not a no-op here)
        of = np.asarray(mf.apply(variables, x, t_early, y, **kw))
        o8 = np.asarray(m8.apply(variables, x, t_early, y, **kw))
        assert np.abs(of - o8).mean() / (np.abs(of).mean() + 1e-9) > 1e-3

    def test_cli_guard_rejects_float_mixed(self):
        import pytest

        from condmdi_tpu.evals.run import main

        with pytest.raises(SystemExit, match="int8_float_last_k"):
            main([
                "--eval_mode", "debug", "--model_path", "",
                "--edit_mode", "benchmark_sparse", "--num_samples", "32",
                "--int8_float_last_k", "50",
            ])


class TestPerChannelStaticScales:
    """'int8_static_pc': per-input-channel static activation scales with
    fold-into-weights dequant (ops/quant.py rank-1 a_scale path). On inputs
    whose channel ranges differ by orders of magnitude — exactly what
    GroupNorm affine spreads produce — a per-tensor scale quantizes the
    small channels to zero; per-channel scales must recover them."""

    def test_rank1_scale_beats_per_tensor_on_spread_channels(self):
        from condmdi_tpu.ops.quant import conv1d_f32, quant_conv1d_from_f32

        rng = np.random.default_rng(0)
        B, T, Cin, Cout, k = 2, 16, 8, 16, 3
        ch_spread = np.logspace(-2, 1, Cin).astype(np.float32)  # 1000x range
        x = jnp.asarray(rng.standard_normal((B, T, Cin)).astype(np.float32)
                        * ch_spread)
        kernel = jnp.asarray(0.1 * rng.standard_normal((k, Cin, Cout)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((Cout,)).astype(np.float32))

        a_pc = jnp.max(jnp.abs(x), axis=(0, 1)) / 127.0          # [Cin]
        a_pt = jnp.max(jnp.abs(x)) / 127.0                        # scalar

        out_f = conv1d_f32(x, kernel, bias, padding=1)
        out_pt = quant_conv1d_from_f32(x, kernel, bias, padding=1, a_scale=a_pt)
        out_pc = quant_conv1d_from_f32(x, kernel, bias, padding=1, a_scale=a_pc)

        def rel(a):
            return float(jnp.abs(a - out_f).mean() / (jnp.abs(out_f).mean() + 1e-9))

        assert rel(out_pc) < 0.01, rel(out_pc)
        # the fold moves part of the burden into the weights (w·s_c spreads
        # the per-output-channel weight range), so the net gain on mean
        # output error is bounded — but it must be a strict improvement
        assert rel(out_pc) < 0.8 * rel(out_pt), (rel(out_pc), rel(out_pt))

    def test_unet_pc_calibrate_and_serve(self):
        """End-to-end through QConv: calibration records per-Cin vectors,
        serving stays finite and at least as close to float as per-tensor."""
        from condmdi_tpu.models.unet import MDM_UNET

        B, T, F = 2, 28, 263
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
        t = jnp.full((B,), 300, jnp.int32)
        y = {"text_embed": jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))}
        kw = dict(
            obs_x0=jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32) * 0.1),
            obs_mask=jnp.zeros((B, T, F), bool).at[:, ::7, :].set(True),
        )
        mk = lambda mode: MDM_UNET(
            njoints=F, latent_dim=32, dim_mults=(1, 2),
            keyframe_conditioned=True, pad_frames_to=32, precision_mode=mode,
        )
        mf = mk("float")
        vs = mf.init(jax.random.key(0), x, t, y, **kw)
        leaves, td = jax.tree_util.tree_flatten(vs["params"])
        prng = np.random.default_rng(5)
        leaves = [
            l + jnp.asarray(0.05 * prng.standard_normal(l.shape).astype(np.float32))
            for l in leaves
        ]
        params = {"params": jax.tree_util.tree_unflatten(td, leaves)}
        out_f = np.asarray(mf.apply(params, x, t, y, **kw))

        def calibrated_out(mode):
            m = mk(mode)
            v0 = m.init(jax.random.key(0), x, t, y, **kw)
            v = {"params": params["params"], "act_scale": v0["act_scale"]}
            _, upd = m.apply(v, x, t, y, **kw, mutable=["act_scale"])
            v = {"params": params["params"], "act_scale": upd["act_scale"]}
            return np.asarray(m.apply(v, x, t, y, **kw)), upd["act_scale"]

        out_pt, _ = calibrated_out("int8_static")
        out_pc, scales_pc = calibrated_out("int8_static_pc")

        # the collection really is per-channel (rank-1 leaves)
        assert all(
            np.ndim(a) == 1 for a in jax.tree_util.tree_leaves(scales_pc)
        )
        assert np.isfinite(out_pc).all()
        scale = np.abs(out_f).mean() + 1e-9
        rel_pc = np.abs(out_pc - out_f).mean() / scale
        rel_pt = np.abs(out_pt - out_f).mean() / scale
        # per-channel must not be WORSE than per-tensor (tiny slack for the
        # folded-weight quantization trade) and stays close to float
        assert rel_pc <= rel_pt * 1.10, (rel_pc, rel_pt)
        assert rel_pc < 0.10, rel_pc
