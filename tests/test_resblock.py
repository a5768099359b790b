"""Fused Pallas conv→GroupNorm→AdaGN→Mish resblock kernel (ops/resblock.py)
parity vs the pure-XLA path, in interpret mode on CPU. The compiled-TPU
measurement lives in scripts/resblock_microbench.py (BENCH_NOTES round 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.ops.resblock import (
    fused_conv_gn_mish,
    reference_conv_gn_mish,
    supports,
)


def make_inputs(B=4, T=16, cin=24, cout=32, k=5, n_groups=8, seed=0,
                adagn=True, res=False):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    x = jnp.asarray(rng.standard_normal((B, T, cin)), f32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.05, f32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, f32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal((cout,)), f32)
    beta = jnp.asarray(0.1 * rng.standard_normal((cout,)), f32)
    kw = {}
    if adagn:
        kw["scale"] = jnp.asarray(0.2 * rng.standard_normal((B, cout)), f32)
        kw["shift"] = jnp.asarray(0.2 * rng.standard_normal((B, cout)), f32)
    if res:
        kw["res"] = jnp.asarray(rng.standard_normal((B, T, cout)), f32)
    return (x, w, b, gamma, beta), kw


@pytest.mark.parametrize("adagn", [True, False])
@pytest.mark.parametrize("res", [True, False])
def test_fused_matches_reference(adagn, res):
    args, kw = make_inputs(adagn=adagn, res=res)
    got = fused_conv_gn_mish(*args, **kw, n_groups=8, interpret=True)
    want = reference_conv_gn_mish(*args, **kw, n_groups=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_batch_tiling_matches_untiled():
    """Taps must not leak across batch items when Bt < B."""
    args, kw = make_inputs(B=6, T=16)
    full = fused_conv_gn_mish(*args, **kw, interpret=True, batch_tile=6)
    tiled = fused_conv_gn_mish(*args, **kw, interpret=True, batch_tile=2)
    np.testing.assert_allclose(np.asarray(full), np.asarray(tiled), atol=2e-5)


def test_cout_tiling_matches_reference():
    """co tile = one group (forced via small groups) across several tiles."""
    args, kw = make_inputs(cout=48, n_groups=4)
    got = fused_conv_gn_mish(*args, **kw, n_groups=4, interpret=True)
    want = reference_conv_gn_mish(*args, **kw, n_groups=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_matches_flax_groupnorm_block():
    """End-to-end vs the production Conv1dAdaGNBlock (models/unet.py)."""
    import flax.linen as nn

    from condmdi_tpu.models.unet import Conv1dAdaGNBlock

    B, T, cin, cout, k = 3, 16, 24, 32, 5
    blk = Conv1dAdaGNBlock(cout, kernel_size=k)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, cin)), np.float32)
    scale = jnp.asarray(0.2 * rng.standard_normal((B, cout)), np.float32)
    shift = jnp.asarray(0.2 * rng.standard_normal((B, cout)), np.float32)
    variables = blk.init(jax.random.key(0), x, scale, shift)
    want = blk.apply(variables, x, scale, shift)

    p = variables["params"]
    got = fused_conv_gn_mish(
        x, p["conv"]["kernel"], p["conv"]["bias"],
        p["norm"]["scale"], p["norm"]["bias"],
        scale=scale, shift=shift, n_groups=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_supports_predicate():
    # the flagship low-T shapes are eligible
    assert supports(64, 56, 1024, 1024, 5, 8)
    assert supports(64, 28, 1024, 1024, 5, 8)
    # T=224 full-resolution convs are NOT: no batch tile that satisfies
    # Pallas sublane divisibility (bt % 8 == 0) fits Mosaic's 16 MB scoped
    # vmem (round-4 hardware: bt=4 at cin=cout=1024 allocated 16.73 MB and
    # OOMed) — these levels take the unfused XLA path
    assert not supports(64, 224, 526, 1024, 5, 8)
    assert not supports(64, 224, 1024, 1024, 5, 8)
    # odd group sizes are not eligible either
    assert not supports(64, 56, 1024, 1000, 5, 8)


@pytest.mark.slow
def test_mdm_unet_fused_matches_standard():
    """Whole-model equivalence: fuse_resblocks=True must reproduce the
    standard path from the SAME checkpoint (identical param tree)."""
    from condmdi_tpu.models.unet import MDM_UNET

    B, T, F = 4, 24, 263
    kw = dict(
        njoints=F, latent_dim=32, dim_mults=(1, 2),
        keyframe_conditioned=True, pad_frames_to=24, zero=False,
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, T, F)), np.float32)
    t = jnp.zeros((B,), jnp.int32)
    y = {"text_embed": jnp.asarray(rng.standard_normal((B, 512)), np.float32)}
    obs = dict(obs_x0=x, obs_mask=jnp.zeros((B, T, F), bool).at[:, ::6].set(True))

    base = MDM_UNET(**kw)
    params = base.init(jax.random.key(0), x, t, y, **obs)
    want = base.apply(params, x, t, y, **obs)

    fused = MDM_UNET(**kw, fuse_resblocks=True)
    # identical tree: the fused path declares the same params
    p2 = fused.init(jax.random.key(0), x, t, y, **obs)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    got = fused.apply(params, x, t, y, **obs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    # train=True must fall back to the differentiable XLA path
    got_train = fused.apply(
        params, x, t, y, **obs, train=True,
        rngs={"cond_mask": jax.random.key(1)},
    )
    assert np.isfinite(np.asarray(got_train)).all()
