"""Whole-pipeline golden test: a REAL reference checkpoint through the REAL
reference sampler vs the converted checkpoint through our JAX sampler.

This is the exact path a released CondMDI checkpoint takes:

  torch MDM_UNET (random-perturbed weights)
    -> torch.save({'model': ..., 'model_avg': ...}, model000123.pt)   # their format
    -> utils/checkpoint.load_torch_checkpoint (EMA-preferred, CLIP-stripped)
    -> our MDM_UNET flax params
  reference SpacedDiffusion p_sample_loop / ddim_sample_loop (keyframe-conditioned)
    vs our ddpm_sample_loop / ddim_sample_loop (lax.scan)

Sampler config mirrors the released-checkpoint path: predict_xstart=True,
sigma_small=True, clip_denoised=False (reference utils/parser_util.py:27-29,
utils/model_util.py:122-165, sample/conditional_synthesis.py:214-226).

The reference model classes import clip/smplx and construct Rotation2xyz
(SMPL body files absent from this image); those are stubbed — none of them
participate in forward() with cond_mode='no_cond'.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.diffusion import (
    DiffusionConfig,
    DiffusionSchedule,
    LossType,
    ModelMeanType,
    ModelVarType,
    ddim_sample_loop,
    ddpm_sample_loop,
    get_named_beta_schedule,
    space_timesteps,
)
from condmdi_tpu.diffusion.sampling import SamplerConfig
from condmdi_tpu.models.unet import MDM_UNET
from condmdi_tpu.utils.checkpoint import load_torch_checkpoint

B, T, F = 2, 48, 263
LATENT, MULTS = 32, (1, 2)
STEPS = 1000


def _to_ref(x):  # [B,T,F] -> [B,F,1,T]
    return np.ascontiguousarray(np.moveaxis(x, 1, 2))[:, :, None, :]


def _from_ref(x):  # [B,F,1,T] -> [B,T,F]
    return np.moveaxis(x[:, :, 0, :], 1, 2)


def _stub_reference_deps():
    if "clip" not in sys.modules:
        sys.modules["clip"] = types.SimpleNamespace(
            load=None, tokenize=None,
            model=types.SimpleNamespace(convert_weights=None),
        )
    if "smplx" not in sys.modules:
        smplx_stub = types.ModuleType("smplx")
        smplx_stub.__path__ = []
        smplx_stub.SMPLLayer = object
        smplx_stub.SMPL = object
        lbs = types.ModuleType("smplx.lbs")
        lbs.vertices2joints = lambda *a, **k: None
        body_models = types.ModuleType("smplx.body_models")
        body_models.SMPLOutput = object
        smplx_stub.lbs = lbs
        smplx_stub.body_models = body_models
        sys.modules["smplx"] = smplx_stub
        sys.modules["smplx.lbs"] = lbs
        sys.modules["smplx.body_models"] = body_models


@pytest.fixture(scope="module")
def pipeline(reference_path, tmp_path_factory):
    """Reference model + saved .pt + converted params + matched inputs."""
    import torch

    _stub_reference_deps()
    import model.mdm_unet as ref_mdm_unet

    class _DummySMPL(torch.nn.Module):
        pass

    class _DummyRot2xyz:
        def __init__(self, *a, **k):
            self.smpl_model = _DummySMPL()

    orig_rot = ref_mdm_unet.Rotation2xyz
    ref_mdm_unet.Rotation2xyz = _DummyRot2xyz
    try:
        torch.manual_seed(7)
        ref = ref_mdm_unet.MDM_UNET(
            modeltype="", njoints=F, nfeats=1, num_actions=1,
            translation=True, pose_rep="rot6d", glob=True, glob_rot=True,
            latent_dim=LATENT, dim_mults=MULTS, attention=False,
            data_rep="hml_vec", dataset="humanml", adagn=True, zero=True,
            arch="unet", keyframe_conditioned=True,
        )
        # the reference's train() override returns None (mdm_unet.py:858),
        # so .eval() cannot be chained off the constructor
        ref.eval()
    finally:
        ref_mdm_unet.Rotation2xyz = orig_rot

    # zero-inits (final conv, AdaGN time MLPs) would make the net trivial;
    # perturb every weight so the full depth participates
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    # save in the reference's exact on-disk format (training_loop.py:402-445):
    # 'model' = online weights, 'model_avg' = EMA. Make the online branch
    # garbage so the test FAILS unless the loader prefers model_avg, and add
    # a clip_model.* key to exercise the stripping path.
    sd_avg = {k: v.clone() for k, v in ref.state_dict().items()}
    sd_online = {k: torch.randn_like(v) for k, v in sd_avg.items()}
    sd_avg["clip_model.token_embedding.weight"] = torch.zeros(3, 3)
    pt_path = tmp_path_factory.mktemp("ref_ckpt") / "model000000123.pt"
    torch.save({"model": sd_online, "model_avg": sd_avg}, pt_path)

    params = load_torch_checkpoint(pt_path, arch="unet", n_levels=len(MULTS), adagn=True)

    ours = MDM_UNET(
        njoints=F, latent_dim=LATENT, dim_mults=MULTS,
        keyframe_conditioned=True, pad_frames_to=224,
    )

    rng = np.random.default_rng(11)
    noise = rng.standard_normal((B, T, F)).astype(np.float32)
    obs_x0 = (rng.standard_normal((B, T, F)) * 0.3).astype(np.float32)
    obs_mask = np.zeros((B, T, F), dtype=bool)
    obs_mask[:, ::8, :] = True  # sparse keyframes, all features

    return dict(
        torch=torch, ref=ref, ours=ours, params=params,
        noise=noise, obs_x0=obs_x0, obs_mask=obs_mask,
    )


def _ref_spaced(reference_path, section):
    import diffusion.gaussian_diffusion as gd
    from diffusion.respace import SpacedDiffusion
    from diffusion.respace import space_timesteps as ref_space

    betas = gd.get_named_beta_schedule("cosine", STEPS)
    conf = gd.DiffusionConfig(
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
    )
    return SpacedDiffusion(ref_space(STEPS, section), conf)


def _our_sched(section):
    betas = get_named_beta_schedule("cosine", STEPS)
    use = space_timesteps(STEPS, section)
    sched = DiffusionSchedule.create(betas, use_timesteps=use)
    # clip_range=None (default) == the reference's clip_denoised=False
    cfg = DiffusionConfig(
        model_mean_type=ModelMeanType.START_X,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
    )
    return sched, cfg


def _our_denoise(pipe):
    ours, params = pipe["ours"], pipe["params"]
    obs_x0 = jnp.asarray(pipe["obs_x0"])
    obs_mask = jnp.asarray(pipe["obs_mask"])

    def denoise(x_t, t):
        return ours.apply(params, x_t, t, {}, obs_x0=obs_x0, obs_mask=obs_mask)

    return denoise


def _ref_model_kwargs(pipe):
    torch = pipe["torch"]
    return {
        "y": {},
        "obs_x0": torch.from_numpy(_to_ref(pipe["obs_x0"])),
        "obs_mask": torch.from_numpy(_to_ref(pipe["obs_mask"])),
    }


class TestWholeSamplerGolden:
    def test_converted_forward_matches_reference(self, reference_path, pipeline):
        """Single forward through the FULL wrapper (keyframe concat, pad-224,
        timestep embedding) with converted real-.pt weights."""
        torch = pipeline["torch"]
        x = pipeline["noise"]
        t = np.array([0, 700])
        with torch.no_grad():
            want = pipeline["ref"](
                torch.from_numpy(_to_ref(x)),
                torch.from_numpy(t),
                **_ref_model_kwargs(pipeline),
            )
        got = _our_denoise(pipeline)(jnp.asarray(x), jnp.asarray(t))
        np.testing.assert_allclose(
            np.asarray(got), _from_ref(want.numpy()), atol=2e-4
        )

    def test_ddpm_respaced_trajectory_parity(self, reference_path, pipeline):
        """25-step respaced DDPM, zero noise: full trajectory determinism."""
        torch = pipeline["torch"]
        diff = _ref_spaced(reference_path, "25")
        noise_t = torch.from_numpy(_to_ref(pipeline["noise"]))
        orig = torch.randn_like
        torch.randn_like = lambda x: torch.zeros_like(x)
        try:
            with torch.no_grad():
                want = diff.p_sample_loop(
                    pipeline["ref"], noise_t.shape, noise=noise_t,
                    clip_denoised=False, model_kwargs=_ref_model_kwargs(pipeline),
                    progress=False,
                )
        finally:
            torch.randn_like = orig

        sched, cfg = _our_sched("25")
        got = ddpm_sample_loop(
            _our_denoise(pipeline), sched, cfg, (B, T, F), jax.random.key(0),
            noise=jnp.asarray(pipeline["noise"]),
            sampler=SamplerConfig(zero_noise=True),
        )
        np.testing.assert_allclose(
            np.asarray(got), _from_ref(want.numpy()), atol=5e-4
        )

    def test_ddim_respaced_trajectory_parity(self, reference_path, pipeline):
        """ddim25 deterministic (eta=0) loop parity."""
        torch = pipeline["torch"]
        diff = _ref_spaced(reference_path, "ddim25")
        noise_t = torch.from_numpy(_to_ref(pipeline["noise"]))
        with torch.no_grad():
            want = diff.ddim_sample_loop(
                pipeline["ref"], noise_t.shape, noise=noise_t,
                clip_denoised=False, model_kwargs=_ref_model_kwargs(pipeline),
                eta=0.0,
            )

        sched, cfg = _our_sched("ddim25")
        got = ddim_sample_loop(
            _our_denoise(pipeline), sched, cfg, (B, T, F), jax.random.key(0),
            noise=jnp.asarray(pipeline["noise"]),
            sampler=SamplerConfig(method="ddim", eta=0.0),
        )
        np.testing.assert_allclose(
            np.asarray(got), _from_ref(want.numpy()), atol=5e-4
        )

    def test_ema_branch_is_preferred(self, reference_path, pipeline):
        """The .pt carries a garbage 'model' branch; conversion must pick
        'model_avg' (reference utils/model_util.py:168-182). If the loader
        ever picked 'model', the forward-parity test above would fail — here
        we additionally pin the behavior directly."""
        sd = {k: v for k, v in pipeline["ref"].state_dict().items()}
        # converted params must equal a fresh conversion of model_avg
        from condmdi_tpu.utils.checkpoint import convert_unet_state_dict

        want = convert_unet_state_dict(sd, n_levels=len(MULTS), adagn=True)
        flat_a = jax.tree_util.tree_leaves(pipeline["params"])
        flat_b = jax.tree_util.tree_leaves(want)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
