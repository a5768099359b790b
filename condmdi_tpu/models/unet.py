"""Temporal 1-D UNet denoiser (CondMDI's flagship model) in Flax.

Architecture parity with reference model/mdm_unet.py:
  * Conv1dBlock (Conv k5 → GroupNorm(8) → Mish)            (:33)
  * Conv1dAdaGNBlock (scale/shift conditioning after GN)    (:70, :159)
  * ResidualTemporalBlock (two conv blocks + time MLP + 1x1 residual,
    AdaGN on the first conv only, zero-init time MLP)       (:163)
  * LinearAttention option                                  (:135)
  * TemporalUnet: downs/mid/ups with skip-concat, final conv zero-init
                                                            (:214-351)
  * MDM_UNET wrapper: keyframe conditioning x=obs⊙m + x⊙(1−m), concat mask
    (263→526 channels), pad frames to 224, text/timestep conditioning
                                                            (:561-851)

TPU-first notes: layout is [B, T, C] (flax Conv convention — channels in the
lane dimension); GroupNorm/Mish fuse into the conv epilogue under XLA; the
pad-to-224 is static. Down/Upsample are stride-2 convs exactly like the
reference (Conv k3 s2 p1 / ConvTranspose k4 s2 p1).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from condmdi_tpu.models.embeddings import EmbedAction, TimestepEmbedder

Array = jax.Array


def mish(x: Array) -> Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class QConv(nn.Module):
    """Conv1d with a precision mode switch.

    Parameter names/shapes are identical to nn.Conv ('kernel' [k,Cin,Cout],
    'bias'), so a single checkpoint serves both modes:
      'float' — plain XLA conv in the incoming dtype (bf16/f32);
      'int8'  — per-channel weight + dynamic activation int8 with int32
                accumulation (ops/quant.py), ~2× MXU rate.
    """

    features: int
    kernel_size: int = 5
    stride: int = 1
    padding: int = 0
    zero_init: bool = False
    precision_mode: str = "float"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.precision_mode == "int8_prequant":
            # serving-only mode: weights live PRE-QUANTIZED in HBM as int8
            # (+ per-channel scale), halving weight traffic vs bf16 — the
            # B=1 latency lever (BENCH_NOTES round 2: in-graph quantization
            # re-reads f32 weights every step and is a net loss at B=1).
            # Param tree layout matches ops/quant.py quantize_params_tree.
            from condmdi_tpu.ops.quant import int8_conv1d

            kq = self.param(
                "kernel_q",
                lambda key, shape: jnp.zeros(shape, jnp.int8),
                (self.kernel_size, x.shape[-1], self.features),
            )
            w_scale = self.param(
                "scale", nn.initializers.ones, (self.features,)
            )
            bias_q = self.param("bias", nn.initializers.zeros, (self.features,))
            amax = self.variable(
                "act_scale", "amax", lambda: jnp.zeros((), jnp.float32)
            )
            if self.is_mutable_collection("act_scale"):
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                )
                return int8_conv1d(
                    x.astype(jnp.float32), kq, w_scale, bias_q,
                    stride=self.stride, padding=self.padding,
                ).astype(x.dtype)
            a_scale = jnp.maximum(amax.value, 1e-8) / 127.0
            return int8_conv1d(
                x.astype(jnp.float32), kq, w_scale, bias_q,
                stride=self.stride, padding=self.padding, a_scale=a_scale,
            ).astype(x.dtype)
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel", init, (self.kernel_size, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.precision_mode == "int8":
            from condmdi_tpu.ops.quant import quant_conv1d_from_f32

            return quant_conv1d_from_f32(
                x, kernel, bias, stride=self.stride, padding=self.padding
            ).astype(x.dtype)
        if self.precision_mode.startswith("int8_static"):
            # static activation scales: the dynamic per-tensor abs-max pass
            # is ~21% of int8 step time (BENCH_NOTES round 2). Calibrate by
            # applying with mutable=["act_scale"] on representative inputs
            # (running max; dynamic quant is used during those passes), then
            # serve with the collection frozen — zero per-step reduces.
            # 'int8_static_pc' records PER-INPUT-CHANNEL maxima; serving
            # folds them into the weights (ops/quant.py rank-1 a_scale path)
            # so the finer granularity costs nothing in the epilogue.
            from condmdi_tpu.ops.quant import quant_conv1d_from_f32

            per_channel = self.precision_mode == "int8_static_pc"
            cin = x.shape[-1]
            amax = self.variable(
                "act_scale", "amax",
                lambda: jnp.zeros((cin,) if per_channel else (), jnp.float32),
            )
            if self.is_mutable_collection("act_scale"):
                ax = jnp.abs(x.astype(jnp.float32))
                amax.value = jnp.maximum(
                    amax.value, jnp.max(ax, axis=(0, 1)) if per_channel
                    else jnp.max(ax)
                )
                return quant_conv1d_from_f32(
                    x, kernel, bias, stride=self.stride, padding=self.padding
                ).astype(x.dtype)
            a_scale = jnp.maximum(amax.value, 1e-8) / 127.0
            return quant_conv1d_from_f32(
                x, kernel, bias, stride=self.stride, padding=self.padding,
                a_scale=a_scale,
            ).astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + bias.astype(x.dtype)


class _ConvParams(nn.Module):
    """Declares conv params with QConv's names/shapes/inits WITHOUT running
    the conv — lets the fused Pallas path share checkpoints with QConv."""

    features: int
    kernel_size: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, cin: int):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel", init, (self.kernel_size, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _NormParams(nn.Module):
    """GroupNorm affine params under nn.GroupNorm's names."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


def _fusable(x: Array, cout: int, k: int, n_groups: int, precision_mode: str,
             fused: bool) -> bool:
    if not fused or precision_mode != "float":
        return False
    import jax

    from condmdi_tpu.ops.resblock import supports

    B, T, cin = x.shape
    return supports(B, T, cin, cout, k, n_groups,
                    interpret=jax.default_backend() != "tpu")


class Conv1dBlock(nn.Module):
    """Conv(k) → GroupNorm(8) → Mish.

    `fused=True` routes eligible shapes through the single-VMEM-residency
    Pallas kernel (ops/resblock.py) — identical param tree, inference-only
    (no custom VJP); ineligible shapes silently use the XLA path.
    """

    out_channels: int
    kernel_size: int = 5
    n_groups: int = 8
    zero: bool = False
    precision_mode: str = "float"
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array, res: Optional[Array] = None) -> Array:
        if _fusable(x, self.out_channels, self.kernel_size, self.n_groups,
                    self.precision_mode, self.fused):
            from condmdi_tpu.ops.resblock import fused_conv_gn_mish

            kernel, bias = _ConvParams(
                self.out_channels, self.kernel_size, zero_init=self.zero,
                name="conv",
            )(x.shape[-1])
            g, b = _NormParams(self.out_channels, name="norm")()
            return fused_conv_gn_mish(
                x, kernel.astype(x.dtype), bias, g, b, res=res,
                n_groups=self.n_groups,
            )
        x = QConv(
            self.out_channels,
            self.kernel_size,
            padding=self.kernel_size // 2,
            zero_init=self.zero,
            precision_mode=self.precision_mode,
            name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=self.n_groups, epsilon=1e-5, name="norm")(x)
        x = mish(x)
        return x if res is None else x + res


class Conv1dAdaGNBlock(nn.Module):
    """Conv → GroupNorm → (1+scale)·x + shift → Mish.

    `fused=True`: see Conv1dBlock."""

    out_channels: int
    kernel_size: int = 5
    n_groups: int = 8
    precision_mode: str = "float"
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array, scale: Array, shift: Array) -> Array:
        if _fusable(x, self.out_channels, self.kernel_size, self.n_groups,
                    self.precision_mode, self.fused):
            from condmdi_tpu.ops.resblock import fused_conv_gn_mish

            kernel, bias = _ConvParams(
                self.out_channels, self.kernel_size, name="conv"
            )(x.shape[-1])
            g, b = _NormParams(self.out_channels, name="norm")()
            return fused_conv_gn_mish(
                x, kernel.astype(x.dtype), bias, g, b,
                scale=scale.astype(x.dtype), shift=shift.astype(x.dtype),
                n_groups=self.n_groups,
            )
        x = QConv(
            self.out_channels,
            self.kernel_size,
            padding=self.kernel_size // 2,
            precision_mode=self.precision_mode,
            name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=self.n_groups, epsilon=1e-5, name="norm")(x)
        x = x * (1.0 + scale[:, None, :]) + shift[:, None, :]
        return mish(x)


class LinearAttention(nn.Module):
    """Efficient linear attention (reference LinearAttention:135)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, T, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):  # [B,T,H*dh] -> [B,H,dh,T]
            return t.reshape(B, T, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        q = q * (self.dim_head**-0.5)
        k = jax.nn.softmax(k, axis=-1)  # softmax over time
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)  # [B,H,dh,T]
        out = out.transpose(0, 3, 1, 2).reshape(B, T, hidden)
        return nn.Dense(C, name="to_out")(out)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels with biased variance (reference LayerNorm:110)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (C,))
        b = self.param("b", nn.initializers.zeros, (C,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps) * g + b


class ResidualTemporalBlock(nn.Module):
    out_channels: int
    kernel_size: int = 5
    adagn: bool = True
    zero: bool = True
    precision_mode: str = "float"
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array, t_emb: Array) -> Array:
        """x: [B, T, C_in]; t_emb: [B, E]."""
        in_channels = x.shape[-1]
        cond_dim = self.out_channels * 2 if self.adagn else self.out_channels
        cond = nn.Dense(
            cond_dim,
            kernel_init=nn.initializers.zeros if self.adagn else nn.initializers.lecun_normal(),
            bias_init=nn.initializers.zeros,
            name="time_mlp",
        )(mish(t_emb))

        # residual first so the fused block2 can absorb the add in-VMEM
        if in_channels != self.out_channels:
            res = QConv(
                self.out_channels, 1, precision_mode=self.precision_mode,
                name="residual_conv",
            )(x)
        else:
            res = x

        if self.adagn:
            scale, shift = jnp.split(cond, 2, axis=-1)
            h = Conv1dAdaGNBlock(
                self.out_channels, self.kernel_size,
                precision_mode=self.precision_mode, fused=self.fused,
                name="block1",
            )(x, scale, shift)
        else:
            h = Conv1dBlock(
                self.out_channels, self.kernel_size,
                precision_mode=self.precision_mode, fused=self.fused,
                name="block1",
            )(x)
            h = h + cond[:, None, :]
        return Conv1dBlock(
            self.out_channels, self.kernel_size, zero=self.zero,
            precision_mode=self.precision_mode, fused=self.fused,
            name="block2",
        )(h, res=res)


class TemporalUnet(nn.Module):
    input_dim: int
    cond_dim: int
    dim: int = 512
    dim_mults: Sequence[float] = (2, 2, 2, 2)
    attention: bool = False
    adagn: bool = True
    zero: bool = True
    added_input_channels: int = 0
    precision_mode: str = "float"
    fuse_resblocks: bool = False

    @nn.compact
    def __call__(self, x: Array, cond: Array) -> Array:
        """x: [B, T, C] (T divisible by 2^(len(dim_mults)-1)); cond: [B, cond_dim]."""
        dims = [self.input_dim] + [int(self.dim * m) for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        c = nn.Dense(self.dim * 4, name="time_fc1")(cond)
        c = mish(c)
        c = nn.Dense(self.dim, name="time_fc2")(c)

        h = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = ResidualTemporalBlock(
                dim_out, adagn=self.adagn, zero=self.zero,
                precision_mode=self.precision_mode,
                fused=self.fuse_resblocks, name=f"down{ind}_res1"
            )(x, c)
            x = ResidualTemporalBlock(
                dim_out, adagn=self.adagn, zero=self.zero,
                precision_mode=self.precision_mode,
                fused=self.fuse_resblocks, name=f"down{ind}_res2"
            )(x, c)
            if self.attention:
                x = x + LinearAttention(name=f"down{ind}_attn")(
                    ChannelLayerNorm(name=f"down{ind}_attn_norm")(x)
                )
            h.append(x)
            if not is_last:
                x = QConv(
                    dim_out, 3, stride=2, padding=1,
                    precision_mode=self.precision_mode,
                    name=f"down{ind}_downsample",
                )(x)

        mid_dim = dims[-1]
        x = ResidualTemporalBlock(
            mid_dim, adagn=self.adagn, zero=self.zero,
            precision_mode=self.precision_mode,
            fused=self.fuse_resblocks, name="mid_block1"
        )(x, c)
        if self.attention:
            x = x + LinearAttention(name="mid_attn")(
                ChannelLayerNorm(name="mid_attn_norm")(x)
            )
        x = ResidualTemporalBlock(
            mid_dim, adagn=self.adagn, zero=self.zero,
            precision_mode=self.precision_mode,
            fused=self.fuse_resblocks, name="mid_block2"
        )(x, c)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            is_last = ind >= n_res - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResidualTemporalBlock(
                dim_in, adagn=self.adagn, zero=self.zero,
                precision_mode=self.precision_mode,
                fused=self.fuse_resblocks, name=f"up{ind}_res1"
            )(x, c)
            x = ResidualTemporalBlock(
                dim_in, adagn=self.adagn, zero=self.zero,
                precision_mode=self.precision_mode,
                fused=self.fuse_resblocks, name=f"up{ind}_res2"
            )(x, c)
            if self.attention:
                x = x + LinearAttention(name=f"up{ind}_attn")(
                    ChannelLayerNorm(name=f"up{ind}_attn_norm")(x)
                )
            if not is_last:
                # SAME ↔ torch ConvTranspose1d(k4, s2, p1): both emit 2L
                x = nn.ConvTranspose(
                    dim_in,
                    (4,),
                    strides=(2,),
                    padding="SAME",
                    name=f"up{ind}_upsample",
                )(x)

        x = Conv1dBlock(
            dims[1], kernel_size=5, precision_mode=self.precision_mode,
            fused=self.fuse_resblocks, name="final_block",
        )(x)
        x = QConv(
            self.input_dim, 1, zero_init=self.zero,
            precision_mode=self.precision_mode, name="final_conv",
        )(x)
        return x


class MDM_UNET(nn.Module):
    """UNet denoiser wrapper with keyframe + text/timestep conditioning."""

    njoints: int = 263
    nfeats: int = 1
    latent_dim: int = 512
    dim_mults: Sequence[float] = (2, 2, 2, 2)
    attention: bool = False
    adagn: bool = True
    zero: bool = True
    data_rep: str = "hml_vec"
    dataset: str = "humanml"
    clip_dim: int = 512
    cond_mode: str = "text"
    cond_mask_prob: float = 0.1
    num_actions: int = 1
    xz_only: bool = False
    keyframe_conditioned: bool = False
    zero_keyframe_loss: bool = False
    pad_frames_to: int = 224
    precision_mode: str = "float"  # 'float' (bf16/f32) | 'int8' serving path
    fuse_resblocks: bool = False  # Pallas fused resblock halves (inference)

    @property
    def input_feats(self) -> int:
        return 2 if self.xz_only else self.njoints * self.nfeats

    def mask_cond(self, cond, force_mask, train: bool):
        if isinstance(force_mask, bool):
            if force_mask:
                return jnp.zeros_like(cond)
        else:
            cond = jnp.where(force_mask[:, None], 0.0, cond)
        if train and self.cond_mask_prob > 0.0:
            rng = self.make_rng("cond_mask")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.cond_mask_prob, (cond.shape[0], 1)
            )
            cond = cond * keep.astype(cond.dtype)
        return cond

    @nn.compact
    def __call__(
        self,
        x: Array,  # [B, T, F]
        timesteps: Array,  # [B]
        y: Optional[dict[str, Any]] = None,
        obs_x0: Optional[Array] = None,
        obs_mask: Optional[Array] = None,
        train: bool = False,
    ) -> Array:
        y = y or {}
        B, T, F = x.shape
        assert (obs_x0 is None) == (obs_mask is None)

        if self.keyframe_conditioned:
            m = obs_mask.astype(x.dtype)
            x = obs_x0 * m + x * (1.0 - m)
            x = jnp.concatenate([x, m], axis=-1)  # [B, T, 2F]

        emb = TimestepEmbedder(self.latent_dim, name="embed_timestep")(timesteps)
        force_mask = y.get("uncond", False)
        if "text" in self.cond_mode and "text_embed" in y:
            enc_text = y["text_embed"].astype(x.dtype)
            emb = emb + nn.Dense(self.latent_dim, name="embed_text")(
                self.mask_cond(enc_text, force_mask, train)
            )
        if "action" in self.cond_mode and "action" in y:
            act = EmbedAction(self.num_actions, self.latent_dim, name="embed_action")(
                y["action"]
            )
            emb = emb + self.mask_cond(act, force_mask, train)

        if self.xz_only and x.shape[-1] == 4:
            x = x[..., (1, 2)]

        # static right-pad to the UNet length (multiple of 2^depth)
        pad_to = self.pad_frames_to
        assert T <= pad_to, f"{T} frames > pad target {pad_to}"
        x = jnp.pad(x, ((0, 0), (0, pad_to - T), (0, 0)))

        # flax convs infer input channels, so the 526-channel keyframe-concat
        # input needs no special-casing; input_dim fixes the OUTPUT width
        # (reference TemporalUnet final_conv emits input_dim=263, :305)
        x = TemporalUnet(
            input_dim=self.input_feats,
            cond_dim=self.latent_dim,
            dim=self.latent_dim,
            dim_mults=self.dim_mults,
            attention=self.attention,
            adagn=self.adagn,
            zero=self.zero,
            precision_mode=self.precision_mode,
            fuse_resblocks=self.fuse_resblocks and not train,
            name="unet",
        )(x, emb)

        x = x[:, :T, :]
        if self.xz_only and F == 4:
            x = jnp.stack(
                [jnp.zeros_like(x[..., 0]), x[..., 0], x[..., 1], jnp.zeros_like(x[..., 0])],
                axis=-1,
            )
        if self.keyframe_conditioned:
            x = x[..., :F]
        return x
