"""int8 serving-path quality gate on a REAL (synthetic-)trained checkpoint.

bench.py's headline is the CondMDI UNet-XL in the int8 serving path; its
promotion over bf16 is gated on quality, not just speed:

  gate 1 — whole-sampler trajectory closeness on random weights
           (tests/test_quant.py::TestInt8WholeSampler);
  gate 2 — THIS file: on the committed checkpoint trained to convergence on
           synthetic motion (save/synthetic_unet_m preferred), the
           benchmark_sparse keyframe error of each int8 flavor's sampling
           must match bf16 sampling within a few percent — each flavor's
           gate binds only while that flavor headlines bench.py.

Full-protocol numbers (1000-step DDPM, 20 replications, real chip) are
recorded in BENCH_NOTES.md; this test reproduces the gate in minutes on CPU
with a respaced sampler — quantization error is per-step, so step count
does not favor int8.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.utils.checkpoint import latest_checkpoint

# prefer the latent-128 gate checkpoint; fall back to the round-2 latent-64
# one. Only KEYFRAME-CONDITIONED runs qualify (round-3 post-mortem: the
# preferred checkpoint had been trained with keyframe_conditioned=false and
# would have silently turned this gate into an unconditioned baseline).
_SAVE = Path(__file__).resolve().parent.parent / "save"


def _conditioned_ckpt(run_dir: Path):
    import json

    args_json = run_dir / "args.json"
    if not args_json.exists():
        return None
    if not json.loads(args_json.read_text()).get("keyframe_conditioned", False):
        return None
    return latest_checkpoint(run_dir)


CKPT = _conditioned_ckpt(_SAVE / "synthetic_unet_m") or _conditioned_ckpt(
    _SAVE / "synthetic_unet_s"
)

pytestmark = [pytest.mark.skipif(CKPT is None, reason="gate checkpoint absent"), pytest.mark.slow]


def _bench_headline() -> str:
    """bench.py's default headline mode (same probe as the protocol gate,
    tests/test_protocol_delta_gate.py)."""
    import re

    src = (_SAVE.parent / "bench.py").read_text()
    m = re.search(r'os\.environ\.get\("BENCH_MODEL",\s*"([^"]+)"\)', src)
    return m.group(1) if m else "unet"


# each unit gate binds only while ITS flavor headlines: the round-5
# promotion is the MIXED path (whose own unit gate + protocol pair bind),
# so the pure-int8 gates revert to documented-skip — their protocol-scale
# failure is what keeps pure int8 demoted (test_protocol_delta_gate.py)
def _binding(modes) -> bool:
    return _bench_headline() in modes


def _bench_float_last_k() -> int:
    """bench.py's default float-tail length — the mixed unit gate tests the
    SAME K the headline serves."""
    import re

    src = (_SAVE.parent / "bench.py").read_text()
    m = re.search(r'os\.environ\.get\("BENCH_FLOAT_LAST_K",\s*"(\d+)"\)', src)
    return int(m.group(1)) if m else 250


@pytest.fixture(scope="module")
def gate_setup():
    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate
    from condmdi_tpu.models.text import HashTextEncoder
    from condmdi_tpu.sampling.synthesize import load_model_for_sampling
    from condmdi_tpu.utils.config import EvalArgs, parse_args

    B, T = 8, 196
    args = parse_args(EvalArgs, [
        "--model_path", str(CKPT),
        "--timestep_respacing", "ddim25", "--use_ddim", "true",
        "--guidance_param", "1.0",
    ])
    ds = SyntheticMotionDataset(
        DatasetConfig(max_motion_length=T, abs_3d=True, split="test"), size=B, seed=5
    )
    batch = collate([ds[i] for i in range(B)], T, HashTextEncoder())
    return args, ds, batch, B, T


@pytest.fixture(scope="module")
def float_sample(gate_setup):
    """The bf16 control sampling, shared across the per-mode gates (it is
    identical in every test and costs minutes on CPU)."""
    args, ds, batch, B, T = gate_setup
    return _sample(args, batch, B, T, "float")


def _sample(args, batch, B, T, precision_mode, drop_obs=False):
    import dataclasses

    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.sampling.synthesize import load_model_for_sampling
    from condmdi_tpu.training.keyframes import get_keyframes_mask

    mixed = precision_mode == "int8_mixed"
    load_mode = "int8_static" if mixed else precision_mode
    args = dataclasses.replace(args, precision_mode=load_mode)
    args._cli_overridden = {"precision_mode", "timestep_respacing", "use_ddim"}
    model, params, sched, dcfg = load_model_for_sampling(args)

    if load_mode == "int8_static":
        # trajectory calibration — the SAME method evals.run uses for the
        # protocol reports (round 4: q_sample-probed ranges clip under CFG
        # extrapolation; ranges are recorded along an actual dynamic-int8
        # sampling trajectory instead)
        from condmdi_tpu.ops.quant import calibrate_act_scales_trajectory

        x0_cal = jnp.asarray(batch["motion"])
        cal_mask = get_keyframes_mask(
            jax.random.key(7), jnp.asarray(batch["lengths"]), T,
            edit_mode="benchmark_sparse", trans_length=10,
        ) & jnp.asarray(batch["time_mask"])[..., None]
        params = calibrate_act_scales_trajectory(
            model, params, sched, dcfg, (B, T, 263),
            {"text_embed": jnp.asarray(batch["text_embed"])},
            guidance_param=float(args.guidance_param),
            obs_x0=x0_cal, obs_mask=cal_mask,
        )

    if mixed:
        # the round-5 headline: int8_static except the last K sampler
        # steps, which run the float twin of the same params (bench.py
        # unet_int8_mixed / evals.run --int8_float_last_k; K tracks
        # bench.py's default so the unit gate tests what the headline serves)
        model_f = model.clone(precision_mode="float")
        k_float = _bench_float_last_k()

        def apply_fn(x, t, y, **kw):
            return jax.lax.cond(
                t[0] < k_float,
                lambda: model_f.apply(params, x, t, y, **kw),
                lambda: model.apply(params, x, t, y, **kw),
            )
    else:
        def apply_fn(x, t, y, **kw):
            return model.apply(params, x, t, y, **kw)

    pipe = SamplePipeline(apply_fn, sched, dcfg, SamplerConfig(method="ddim", eta=0.0))
    obs_x0 = jnp.asarray(batch["motion"])
    obs_mask = get_keyframes_mask(
        jax.random.key(7), jnp.asarray(batch["lengths"]), T,
        edit_mode="benchmark_sparse", trans_length=10,
    )
    obs_mask = obs_mask & jnp.asarray(batch["time_mask"])[..., None]
    y = {"text_embed": jnp.asarray(batch["text_embed"])}
    sample = pipe.sample(
        jax.random.key(11), (B, T, 263), y,
        obs_x0=jnp.zeros_like(obs_x0) if drop_obs else obs_x0,
        obs_mask=jnp.zeros_like(obs_mask) if drop_obs else obs_mask,
    )
    return np.asarray(sample), np.asarray(obs_mask)


def _keyframe_error(sample, batch, obs_mask, ds):
    from condmdi_tpu.data.humanml_repr import recover_from_ric
    from condmdi_tpu.evals.harness import compute_kps_error
    from condmdi_tpu.evals.metrics import calculate_keyframe_error

    cur = np.asarray(recover_from_ric(jnp.asarray(ds.denormalize(sample)), 22, abs_3d=True))
    gt = np.asarray(
        recover_from_ric(jnp.asarray(ds.denormalize(np.asarray(batch["motion"]))), 22, abs_3d=True)
    )
    kf = obs_mask.any(axis=2)
    err, num = compute_kps_error(cur, gt, kf, traj_only=False)
    return calculate_keyframe_error(err, num)


class TestInt8KeyframeErrorGate:
    def test_keyframe_error_delta_small(self, gate_setup, float_sample):
        args, ds, batch, B, T = gate_setup
        s_f, m_f = float_sample
        s_q, m_q = _sample(args, batch, B, T, "int8")
        np.testing.assert_array_equal(m_f, m_q)

        kf_f = _keyframe_error(s_f, batch, m_f, ds)
        kf_q = _keyframe_error(s_q, batch, m_q, ds)
        delta = abs(kf_q - kf_f) / max(kf_f, 1e-9)
        # the gate: int8 keyframe error within 5% of bf16 on a trained model.
        # Binding only while bench.py headlines the PURE dynamic-int8 path
        # (round 4 demoted pure int8 after the PROTOCOL-level gate failed;
        # round 5's headline is the mixed path, gated by its own unit test
        # below + the committed protocol pair — see
        # tests/test_protocol_delta_gate.py); otherwise an exceeded delta is
        # documented, not fatal.
        if not _binding(("unet_int8",)) and delta >= 0.05:
            pytest.skip(f"int8 dynamic unit delta {delta:.3f} >= 5% "
                        "(pure dynamic int8 does not headline)")
        assert delta < 0.05, (kf_f, kf_q, delta)

        # second quality axis: whole-sequence joint error vs GT must match
        # too. (Raw sample-space closeness is NOT asserted: per-step int8
        # perturbations compound chaotically through the sampler as the
        # model sharpens, so int8 and bf16 runs are two draws from ~the same
        # distribution rather than the same trajectory — per-step
        # non-compounding on matched noise is covered by
        # tests/test_quant.py::TestInt8WholeSampler.)
        def joint_err(sample):
            from condmdi_tpu.data.humanml_repr import recover_from_ric
            import jax.numpy as jnp

            cur = np.asarray(
                recover_from_ric(jnp.asarray(ds.denormalize(sample)), 22, abs_3d=True)
            )
            gt = np.asarray(
                recover_from_ric(
                    jnp.asarray(ds.denormalize(np.asarray(batch["motion"]))), 22,
                    abs_3d=True,
                )
            )
            tm = np.asarray(batch["time_mask"])[:, :, None, None]
            return float(
                (np.linalg.norm(cur - gt, axis=-1, keepdims=True) * tm).sum()
                / tm.sum()
            )

        je_f, je_q = joint_err(s_f), joint_err(s_q)
        assert abs(je_q - je_f) / max(je_f, 1e-9) < 0.05, (je_f, je_q)

    def test_static_scale_keyframe_error_delta_small(self, gate_setup, float_sample):
        """Same quality gate for the static-activation-scale int8 path
        (scales calibrated on q_sample of the GT batch across the t range).
        Passing this is the promotion criterion for `int8_static` becoming
        the bench headline."""
        args, ds, batch, B, T = gate_setup
        s_f, m_f = float_sample
        s_s, m_s = _sample(args, batch, B, T, "int8_static")
        np.testing.assert_array_equal(m_f, m_s)

        kf_f = _keyframe_error(s_f, batch, m_f, ds)
        kf_s = _keyframe_error(s_s, batch, m_s, ds)
        delta = abs(kf_s - kf_f) / max(kf_f, 1e-9)
        if not _binding(("unet_int8_static", "unet_int8_static_pc")) and delta >= 0.05:
            pytest.skip(f"int8_static unit delta {delta:.3f} >= 5% "
                        "(pure static int8 does not headline)")
        assert delta < 0.05, (kf_f, kf_s, delta)

    def test_mixed_tail_keyframe_error_delta_small(self, gate_setup, float_sample):
        """Unit gate for the round-5 HEADLINE: int8_static with the last
        250 sampler steps on the float twin. Binding while
        bench.py headlines unet_int8_mixed; the protocol-scale half of the
        promotion evidence is the committed 992x20 f250 pair
        (tests/test_protocol_delta_gate.py)."""
        args, ds, batch, B, T = gate_setup
        s_f, m_f = float_sample
        s_m, m_m = _sample(args, batch, B, T, "int8_mixed")
        np.testing.assert_array_equal(m_f, m_m)

        kf_f = _keyframe_error(s_f, batch, m_f, ds)
        kf_m = _keyframe_error(s_m, batch, m_m, ds)
        delta = abs(kf_m - kf_f) / max(kf_f, 1e-9)
        if not _binding(("unet_int8_mixed",)) and delta >= 0.05:
            pytest.skip(f"mixed-tail unit delta {delta:.3f} >= 5% "
                        "(mixed path does not headline)")
        assert delta < 0.05, (kf_f, kf_m, delta)

    def test_trained_model_beats_trivial_baseline(self, gate_setup):
        """Sanity that the gate checkpoint is a real conditional model.

        Two checks:
          (a) its keyframe error beats the all-zeros 'prediction'
              (= the population-mean motion in denormalized space);
          (b) the conditioning is CAUSALLY used — the same model sampled
              with the keyframe observations dropped must be measurably
              worse.

        No wide margin is demanded over (a): the reference TemporalUnet
        with unet_zero=True is slow to open its input pathway at small
        training budgets (verified side-by-side: the torch reference
        plateaus identically on an identity-regression probe), so a small
        synthetic-budget model legitimately sits between the trivial
        baseline and the keyframe-perfect regime the paper's 1.2M-step
        latent-512 runs reach."""
        args, ds, batch, B, T = gate_setup
        s_f, m_f = _sample(args, batch, B, T, "float")
        kf_f = _keyframe_error(s_f, batch, m_f, ds)
        kf_zero = _keyframe_error(np.zeros_like(s_f), batch, m_f, ds)
        # quantitative margin (ADVICE r2): a model only marginally better
        # than predicting the population mean must NOT pass. The committed
        # 30k-step checkpoint measures kf_f/kf_zero ≈ 0.77 (1.234/1.604,
        # BENCH_NOTES.md) — 0.9 leaves headroom for re-trains without
        # letting a near-trivial model through.
        assert kf_f < 0.9 * kf_zero, (kf_f, kf_zero)

        s_drop, _ = _sample(args, batch, B, T, "float", drop_obs=True)
        kf_drop = _keyframe_error(s_drop, batch, m_f, ds)
        # conditioning must reduce keyframe error by at least 5%
        assert kf_f < 0.95 * kf_drop, (kf_f, kf_drop)
