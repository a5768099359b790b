"""Training loop: pjit'd data-parallel train step, AdamW, EMA, LR anneal.

Parity target: reference train/training_loop.py:35 (TrainLoop) — per-batch
keyframe conditioning injection (:213-223), AdamW (:82-89), grad-clip
(:307-309), EMA model_avg (:325-336, beta 0.9999), linear LR anneal (:386),
loss quartile logging (:487), checkpoint save/resume.

TPU-first differences:
  * ONE jitted train step containing: t-sampling, keyframe-mask generation
    (on device — the reference does this per-batch on the host), q_sample,
    model fwd/bwd, optax update, EMA lerp. No Python between steps but the
    data feed.
  * bf16 activations instead of fp16 + GradScaler: TPUs train bf16 natively,
    so the reference's loss-scaling machinery (fp16_util.py) is obsolete and
    intentionally absent. Master params stay f32.
  * Data parallelism via mesh sharding (parallel/mesh.py): batch sharded on
    'dp', params replicated; XLA inserts the gradient psum.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from condmdi_tpu.diffusion.gaussian import DiffusionConfig, training_losses
from condmdi_tpu.diffusion.resample import LossAwareState, uniform_sample_t
from condmdi_tpu.diffusion.schedule import DiffusionSchedule
from condmdi_tpu.training.keyframes import get_keyframes_mask

Array = jax.Array


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.01
    adam_beta2: float = 0.999
    grad_clip: float = 1.0
    avg_model_beta: float = 0.9999
    lr_anneal_steps: int = 0
    num_steps: int = 1_200_000
    batch_size: int = 64
    log_interval: int = 1_000
    save_interval: int = 100_000
    schedule_sampler: str = "uniform"
    # keyframe conditioning (CondMDI)
    keyframe_conditioned: bool = False
    keyframe_selection_scheme: str = "random_frames"
    keyframe_mask_prob: float = 0.1
    zero_keyframe_loss: bool = False
    use_bf16: bool = False
    # rematerialize the denoiser forward in the backward pass: trades ~1
    # extra forward of FLOPs for dropping all denoiser activations from HBM
    # (headroom for batch >256 / longer contexts on one chip)
    remat: bool = False


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    step: Array
    params: Any
    ema_params: Any
    opt_state: Any
    loss_aware: Optional[LossAwareState] = None


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip + linear anneal (reference :82-89, :386)."""
    if cfg.lr_anneal_steps:
        schedule = optax.linear_schedule(cfg.lr, 0.0, cfg.lr_anneal_steps)
    else:
        schedule = cfg.lr
    chain = []
    if cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(
        optax.adamw(
            schedule,
            b1=0.9,
            b2=cfg.adam_beta2,
            weight_decay=cfg.weight_decay,
        )
    )
    return optax.chain(*chain)


def create_train_state(
    params: Any, cfg: TrainConfig, sched: DiffusionSchedule
) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=opt.init(params),
        loss_aware=(
            LossAwareState.create(sched.num_timesteps)
            if cfg.schedule_sampler == "loss-second-moment"
            else None
        ),
    )


def make_train_step(
    apply_fn: Callable[..., Array],
    sched: DiffusionSchedule,
    dcfg: DiffusionConfig,
    tcfg: TrainConfig,
    raw: bool = False,
):
    """Build the jitted train step (raw=True: unjitted, for scanning).

    apply_fn(params, x, t, y, obs_x0, obs_mask, rngs) -> model output.
    batch: dict(motion [B,T,F], time_mask [B,T], lengths [B],
                text_embed [B,512] optional, action [B] optional).
    """
    opt = make_optimizer(tcfg)

    def loss_fn(params, batch, t, weights, rng):
        motion = batch["motion"]
        if tcfg.use_bf16:
            motion_in = motion.astype(jnp.bfloat16)
        else:
            motion_in = motion
        rng_noise, rng_model = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, motion.shape, motion.dtype)

        y = {}
        for k in ("text_embed", "action"):
            if k in batch:
                y[k] = batch[k]

        obs_x0 = batch.get("obs_x0")
        obs_mask = batch.get("obs_mask")

        def denoise(x_t, t_model):
            if tcfg.use_bf16:
                x_t = x_t.astype(jnp.bfloat16)
            kw = {}
            if tcfg.keyframe_conditioned:
                kw = dict(obs_x0=obs_x0.astype(x_t.dtype), obs_mask=obs_mask)
            out = apply_fn(
                params,
                x_t,
                t_model,
                y,
                train=True,
                rngs={"cond_mask": rng_model, "dropout": jax.random.fold_in(rng_model, 1)},
                **kw,
            )
            return out.astype(jnp.float32)

        if tcfg.remat:
            denoise = jax.checkpoint(denoise)

        terms = training_losses(
            denoise,
            sched,
            dcfg,
            motion,
            t,
            noise,
            batch["time_mask"],
            obs_mask=obs_mask,
            zero_keyframe_loss=tcfg.zero_keyframe_loss,
            keyframe_conditioned=tcfg.keyframe_conditioned,
        )
        loss = jnp.mean(terms["loss"] * weights)
        return loss, terms

    def train_step(state: TrainState, batch: dict, rng: Array):
        rng_t, rng_kf, rng_drop, rng_loss = jax.random.split(rng, 4)
        B = batch["motion"].shape[0]
        T = batch["motion"].shape[1]

        # keyframe conditioning injection (reference :213-223)
        if tcfg.keyframe_conditioned:
            obs_mask = get_keyframes_mask(
                rng_kf,
                batch["lengths"],
                T,
                edit_mode=tcfg.keyframe_selection_scheme,
            )
            if tcfg.keyframe_mask_prob > 0.0:
                drop = jax.random.bernoulli(
                    rng_drop, tcfg.keyframe_mask_prob, (B, 1, 1)
                )
                obs_mask = obs_mask & ~drop
            # obs_mask must be a subset of the validity mask (:221-223)
            obs_mask = obs_mask & batch["time_mask"][..., None]
            batch = {**batch, "obs_x0": batch["motion"], "obs_mask": obs_mask}

        if state.loss_aware is not None:
            t, weights = state.loss_aware.sample(rng_t, B)
        else:
            t, weights = uniform_sample_t(rng_t, B, sched.num_timesteps)

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, t, weights, rng_loss
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA (reference update_average_model:325)
        beta = tcfg.avg_model_beta
        if beta > 0:
            ema_params = jax.tree_util.tree_map(
                lambda a, p: a * beta + p * (1.0 - beta), state.ema_params, params
            )
        else:
            ema_params = params

        loss_aware = state.loss_aware
        if loss_aware is not None:
            loss_aware = loss_aware.update(t, terms["loss"])

        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "param_norm": optax.global_norm(params),
        }
        for k in ("rot_mse", "keyframes_mse", "vel_mse", "vb"):
            if k in terms:
                metrics[k] = jnp.mean(terms[k])
        # loss quartiles over t (reference log_loss_dict:487)
        quartile = (4 * t / sched.num_timesteps).astype(jnp.int32)
        for q in range(4):
            sel = quartile == q
            metrics[f"loss_q{q}"] = jnp.sum(
                jnp.where(sel, terms["loss"], 0.0)
            ) / jnp.maximum(jnp.sum(sel), 1)

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            loss_aware=loss_aware,
        )
        return new_state, metrics

    if raw:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_chained_train_step(
    apply_fn: Callable[..., Array],
    sched: DiffusionSchedule,
    dcfg: DiffusionConfig,
    tcfg: TrainConfig,
    mesh=None,
):
    """K train steps per host dispatch, as ONE lax.scan over the step.

    Built for the device-HBM data cache: batches are gathered ON-DEVICE
    from the cached dataset by a [K, B] index array, so a dispatch moves
    only indices + one rng key across the host↔device link. This is what
    makes small-model training fast through the remote-TPU relay — the
    per-step dispatch latency (~200 ms observed) otherwise dwarfs the
    compute (~3 ms for the latent-128 gate config). No reference
    equivalent (the reference is a per-step eager loop).

    `mesh`: optional jax.sharding.Mesh — the gathered per-step batch is then
    constrained to batch-dim 'dp' sharding inside the scan body, so the
    chained path data-parallelizes exactly like the single-step path
    (host-side shard_batch can't reach batches materialized on device).

    Returns jitted (state, data, idx [K,B], rng) -> (state, metrics) with
    metrics averaged over the K steps (loss also reported as `loss_last`).
    """
    step = make_train_step(apply_fn, sched, dcfg, tcfg, raw=True)

    batch_constraint = None
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from condmdi_tpu.parallel.mesh import DATA_AXIS

        dp = NamedSharding(mesh, PartitionSpec(DATA_AXIS))

        def batch_constraint(batch):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(a, dp)
                if getattr(a, "ndim", 0) >= 1 else a,
                batch,
            )

    def chained(state: TrainState, data: dict, idx: Array, rng: Array):
        K = idx.shape[0]

        def body(carry, inp):
            i, r = inp
            batch = jax.tree_util.tree_map(lambda a: a[i], data)
            if batch_constraint is not None:
                batch = batch_constraint(batch)
            return step(carry, batch, r)

        rngs = jax.random.split(rng, K)
        state, ms = jax.lax.scan(body, state, (idx, rngs))
        metrics = {k: jnp.mean(v) for k, v in ms.items()}
        metrics["loss_last"] = ms["loss"][-1]
        return state, metrics

    return jax.jit(chained, donate_argnums=(0,))
