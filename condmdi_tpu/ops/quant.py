"""Int8 quantized inference ops (experimental serving path).

TPU MXUs run int8 matmuls at 2× the bf16 rate; for the sampling-bound
CondMDI serving workload (1000 UNet forwards per sample) weight+activation
int8 is the next rung past bf16. This module provides:

  * per-output-channel symmetric weight quantization,
  * dynamic per-tensor activation quantization,
  * `int8_conv1d` — quantized 1-D convolution with int32 accumulation and
    fused dequant epilogue,
  * `quantize_params_tree` — one-shot conversion of a conv params tree.

Status: the FLOAT-TAIL MIXED-STEP path (`int8_float_last_k=250`: int8_static
for the first 750 sampler steps, the float twin for the last 250) IS the
bench headline since round 5 — its 992x20 wo_mm protocol pair is inside the
promotion gate on every metric (FID +0.08%, keyframe -0.10% vs bf16) at
7.62 samples/s = 27.4x. PURE int8 stays opt-in: promoted in round 2 on a
keyframe-error-only gate, DEMOTED in round 4 when the full protocol pair
showed quantization noise compounding over the 1000-step loop (+31%
keyframe error; replicated +28% on the live round-5 pair — see
BENCH_NOTES.md and tests/test_protocol_delta_gate.py, which machine-checks
the decision in both directions). The round-5 K-sweep localized the damage:
it accrues almost entirely in the LAST ~250 steps (a float head recovers
nothing; a float tail recovers float-level quality), which is what makes
the mixed path sound. `int8_static` is the fastest pure variant (~32x;
`int8_static_pc` per-input-channel 9.03); `int8_prequant` is the B=1
serving path; dynamic int8 is the calibration-free fallback.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_weight_per_channel(w: Array):
    """[k, in, out] f32 → (int8 weights, f32 scale [out])."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_activation(x: Array):
    """Dynamic per-tensor symmetric int8 quantization."""
    amax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def int8_conv1d(
    x: Array,  # [B, T, Cin] float
    wq: Array,  # [k, Cin, Cout] int8
    w_scale: Array,  # [Cout]
    bias: Array | None = None,
    stride: int = 1,
    padding: int = 0,
    a_scale: Array | None = None,
) -> Array:
    """Quantized conv: int8×int8→int32 on the MXU, dequant epilogue.

    a_scale: optional STATIC activation scale (from calibration). Skips the
    dynamic per-tensor abs-max pass — profiled at ~21% of int8 step time
    (BENCH_NOTES round 2) — at the cost of clipping activations that exceed
    the calibrated range.
    """
    if a_scale is not None:
        xq = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
    else:
        xq, a_scale = quantize_activation(x)
    out = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        out = out + bias
    return out


def conv1d_f32(x, w, bias=None, stride=1, padding=0):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + bias if bias is not None else out


def quant_conv1d_from_f32(
    x: Array,
    kernel: Array,  # [k, Cin, Cout] float (the stored checkpoint weight)
    bias: Array | None = None,
    stride: int = 1,
    padding: int = 0,
    a_scale: Array | None = None,
) -> Array:
    """int8 conv taking the ORIGINAL f32/bf16 kernel: weights are quantized
    per-channel in-graph (cheap vs the conv; lets the same parameter tree
    serve both precision modes) and activations dynamically per-tensor —
    or statically when a calibrated `a_scale` is supplied.

    A RANK-1 `a_scale` [Cin] selects per-input-channel static activation
    quantization with fold-into-weights dequant: the conv contracts over
    (k, Cin), so a per-Cin activation scale cannot sit in the epilogue —
    instead fold it into the kernel BEFORE weight quantization
    (w~ = w * s_c), quantize x as x/s_c, and dequant by the weight scale
    alone:  Σ (x/s_c)·(w·s_c)·ŵ = Σ x·w  exactly (up to the two roundings).
    Per-channel ranges track GroupNorm-affine channel spreads that a
    per-tensor scale wastes resolution on; the fold is free at serving
    time because the static scales are known when the weights quantize."""
    if a_scale is not None and getattr(a_scale, "ndim", 0) == 1:
        kf = kernel.astype(jnp.float32) * a_scale[None, :, None]
        wq, w_scale = quantize_weight_per_channel(kf)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
        ).astype(jnp.int8)
        out = jax.lax.conv_general_dilated(
            xq, wq, window_strides=(stride,), padding=[(padding, padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * w_scale
        return out + bias if bias is not None else out
    wq, w_scale = quantize_weight_per_channel(kernel.astype(jnp.float32))
    return int8_conv1d(
        x.astype(jnp.float32), wq, w_scale, bias=bias, stride=stride,
        padding=padding, a_scale=a_scale,
    )


def quantize_params_tree(params: Any) -> Any:
    """Replace every QConv {'kernel': [k,in,out], 'bias'} leaf with
    {'kernel_q', 'scale', 'bias'} — the layout `QConv(precision_mode=
    'int8_prequant')` reads (int8 weights resident in HBM; half the weight
    traffic of bf16 for B=1 serving). Dense kernels [in,out] are kept f32.
    ConvTranspose 'up*_upsample' kernels are rank-3 too but are NOT QConvs
    and are excluded by name (the stride-2 'down*_downsample' convs ARE
    QConvs and are quantized)."""

    def walk(node, name=""):
        if isinstance(node, dict):
            if (
                "kernel" in node
                and getattr(node["kernel"], "ndim", 0) == 3
                and "upsample" not in name
            ):
                wq, s = quantize_weight_per_channel(jnp.asarray(node["kernel"]))
                out = {"kernel_q": wq, "scale": s}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)


def int8_matmul(x: Array, kernel: Array, bias: Array | None = None) -> Array:
    """Quantized dense: x [..., Din] f32 × kernel [Din, Dout] f32 → f32.

    Per-tensor dynamic activation scale, per-column weight scale, int32
    accumulation on the MXU (2× bf16 rate).
    """
    amax_w = jnp.max(jnp.abs(kernel), axis=0)
    w_scale = jnp.maximum(amax_w, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)

    xq, a_scale = quantize_activation(x.astype(jnp.float32))
    out = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        out = out + bias
    return out


def calibrate_act_scales_trajectory(
    model,
    params: Any,
    sched,
    dcfg,
    shape: tuple,
    y: dict,
    *,
    guidance_param: float = 1.0,
    obs_x0: Array | None = None,
    obs_mask: Array | None = None,
    seed: int = 100,
    headroom: float = 1.25,
) -> Any:
    """Serving-distribution calibration for `precision_mode='int8_static'`.

    `calibrate_act_scales` (below) probes q_sample(x0, t) states — the
    FORWARD-process marginals. But the serving program is the REVERSE
    process under classifier-free guidance: at guidance > 1 the CFG
    extrapolation pushes intermediate x_t outside the forward marginals,
    activations clip against the q_sample-calibrated ranges, the biased eps
    feeds back, and the 1000-step scan diverges to inf (round-4 battery
    leg 4: the int8_static wo_mm run at guidance 2.5 produced non-finite
    motions; reference protocol eval_humanml_condmdi.py:215-332).

    This variant records activation ranges along the ACTUAL sampling
    trajectory: one full DDPM run at the serving guidance with the
    act-scale running-max pytree threaded through the scan carry. Each step
    applies the model with `mutable=['act_scale']` — in that branch QConv
    computes with DYNAMIC int8 quantization (models/unet.py int8_static
    mutable path), so the trajectory is the dynamic-int8 sampler's, a close
    proxy for the static-scale serving trajectory. `headroom` multiplies
    the recorded maxima at freeze time to absorb the residual
    static-vs-dynamic trajectory drift (costs <0.4 bit of resolution at
    1.25x).

    Returns `{'params': ..., 'act_scale': ...}` ready for `model.apply`.
    """
    import numpy as np

    from condmdi_tpu.diffusion.gaussian import p_mean_variance
    from condmdi_tpu.diffusion.sampling import _nonzero_mask

    B = shape[0]
    p = params["params"] if "params" in params else params
    cfg_doubled = guidance_param != 1.0

    obs_kw = {}
    if obs_x0 is not None:
        if cfg_doubled:
            obs_kw = dict(
                obs_x0=jnp.concatenate([obs_x0, obs_x0], axis=0),
                obs_mask=jnp.concatenate([obs_mask, obs_mask], axis=0),
            )
        else:
            obs_kw = dict(obs_x0=obs_x0, obs_mask=obs_mask)

    if cfg_doubled:
        y2 = dict(y)
        for k, v in y.items():
            if isinstance(v, jax.Array) and v.ndim >= 1 and v.shape[0] == B:
                y2[k] = jnp.concatenate([v, v], axis=0)
        y2["uncond"] = jnp.concatenate(
            [jnp.zeros((B,), bool), jnp.ones((B,), bool)], axis=0
        )
    else:
        y2 = y

    def apply_mut(scales, x_t, t_model):
        variables = {"params": p}
        if scales is not None:
            variables["act_scale"] = scales
        if cfg_doubled:
            x2 = jnp.concatenate([x_t, x_t], axis=0)
            t2 = jnp.concatenate([t_model, t_model], axis=0)
            out, upd = model.apply(
                variables, x2, t2, y2, mutable=["act_scale"], **obs_kw
            )
            out_cond, out_uncond = out[:B], out[B:]
            out = out_uncond + guidance_param * (out_cond - out_uncond)
        else:
            out, upd = model.apply(
                variables, x_t, t_model, y2, mutable=["act_scale"], **obs_kw
            )
        return out, upd["act_scale"]

    # seed the collection structure (zeros) with one apply at pure noise
    rng0 = jax.random.key(seed)
    x_T = jax.random.normal(rng0, shape)
    tT = jnp.full((B,), sched.num_timesteps - 1, jnp.int32)
    _, scales0 = apply_mut(None, x_T, sched.model_t(tT))
    scales0 = jax.tree_util.tree_map(jnp.zeros_like, scales0)

    @jax.jit
    def run(scales0, x_init, rng):
        def body(carry, i):
            x, scales, rng = carry
            rng, nrng = jax.random.split(rng)
            t = jnp.full((B,), i, jnp.int32)
            box = {}

            def denoise(x_t, t_model):
                out, new_scales = apply_mut(scales, x_t, t_model)
                box["s"] = new_scales
                return out

            out = p_mean_variance(denoise, sched, dcfg, x, t)
            z = jax.random.normal(nrng, x.shape, x.dtype)
            sample = out["mean"] + _nonzero_mask(t, x.ndim) * jnp.exp(
                0.5 * out["log_variance"]
            ) * z
            return (sample, box["s"], rng), None

        ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
        (x, scales, _), _ = jax.lax.scan(body, (x_init, scales0, rng), ts)
        return x, scales

    x_fin, scales = run(scales0, x_T, rng0)
    if not bool(np.isfinite(np.asarray(x_fin)).all()):
        import warnings

        warnings.warn(
            "calibration trajectory (dynamic int8) is itself non-finite at "
            f"guidance {guidance_param} — int8 serving at this guidance is "
            "numerically unstable; use bf16 or a lower guidance",
            stacklevel=2,
        )
    scales = jax.tree_util.tree_map(lambda a: a * headroom, scales)
    return {"params": p, "act_scale": scales}


def calibrate_act_scales(
    model,
    params: Any,
    sched,
    x0: Array,
    y: dict,
    t_fracs=(0.999, 0.75, 0.5, 0.25, 0.0),
    seed: int = 100,
    **apply_kw,
) -> Any:
    """Populate the `act_scale` collection for `precision_mode='int8_static'`.

    Runs the model with `mutable=['act_scale']` on `q_sample(x0, t)` at a
    spread of timestep fractions so every QConv records a running abs-max
    over the activation range the sampler actually traverses (the x_t
    distribution sweeps from ~N(0,1) at t≈T to the data scale at t=0).
    Returns `{'params': ..., 'act_scale': ...}` ready for `model.apply`.

    Shared by bench.py, tests/test_int8_gate.py, and the eval protocol
    (`evals.run --precision_mode int8_static`) so all three calibrate
    identically. Reference has no analogue (torch fp32/fp16 only,
    model/mdm_unet.py); this is the TPU serving path.
    """
    from condmdi_tpu.diffusion.gaussian import q_sample

    x0 = jnp.asarray(x0)
    n_sched = sched.num_timesteps
    variables = {"params": params["params"]}
    for i, frac in enumerate(t_fracs):
        it = jnp.full((x0.shape[0],), int(frac * (n_sched - 1)), jnp.int32)
        x_t = q_sample(
            sched, x0, it, jax.random.normal(jax.random.key(seed + i), x0.shape)
        )
        _, upd = model.apply(
            variables, x_t, sched.model_t(it), y, **apply_kw,
            mutable=["act_scale"],
        )
        variables = {"params": params["params"], "act_scale": upd["act_scale"]}
    return variables
