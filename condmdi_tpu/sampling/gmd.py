"""GMD guidance pack: trajectory-target gradient guidance + two-stage
generation (reference sample/gmd/ — condition.py, keyframe_pattern.py,
generate.py).

TPU-native re-design: the reference's CondKeyLocations does
`torch.autograd.grad(-loss, x)` in eager Python each denoising step
(condition.py:577); here the same guidance is a `cond_loss_fn` closure whose
gradient is taken in-graph by the sampler scan (diffusion/sampling.py) — one
fused forward+backward per step, no host round trips.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.data.humanml_repr import recover_from_ric
from condmdi_tpu.utils.assets import NormStats

Array = jax.Array

# ---- hand-authored keyframe patterns (keyframe_pattern.py:3) --------------- #
KFRAME_PATTERNS = {
    "square": [
        (1, (0.0, 0.0)), (30, (0.0, 3.0)), (45, (1.5, 3.0)), (60, (3.0, 3.0)),
        (75, (3.0, 1.5)), (90, (3.0, 0.0)), (105, (1.5, 0.0)), (119, (0.0, 0.0)),
    ],
    "inverse_N": [
        (1, (0.0, 0.0)), (30, (0.0, 3.0)), (45, (1.5, 1.5)), (60, (3.0, 0.0)),
        (90, (3.0, 3.0)), (119, (0.0, 0.0)),
    ],
    "3dots": [(1, (0.0, 0.0)), (59, (0.0, 3.0)), (119, (3.0, 3.0))],
    "zigzag": [
        (1, (0.0, 0.0)), (30, (1.0, 1.5)), (60, (-1.0, 3.0)), (90, (1.0, 4.5)),
        (119, (0.0, 6.0)),
    ],
    "sdf_obstacle": [(1, (0.0, 0.0)), (119, (0.0, 6.0))],
}


def get_kframes(
    pattern: str = "square",
    ground_positions: Optional[np.ndarray] = None,
    interpolate: bool = False,
):
    """Keyframe (frame, (x, z)) list; from GT positions when provided.

    interpolate=True densifies the pattern to every frame via linear
    interpolation (reference keyframe_pattern.py:144 interpolate_kps)."""
    if ground_positions is not None:
        k_positions = list(range(1, 120)) + [119]
        return [
            (k, (float(ground_positions[k - 1, 0, 0]), float(ground_positions[k - 1, 0, 2])))
            for k in sorted(set(k_positions))
        ]
    kframes = list(KFRAME_PATTERNS[pattern])
    if interpolate:
        last_frame = kframes[-1][0]
        traj = interpolate_kframes_trajectory(kframes, last_frame + 1)
        kframes = [(t, (float(traj[t, 0]), float(traj[t, 1]))) for t in range(last_frame + 1)]
    return kframes


def get_obstacles() -> list[tuple[float, float, float]]:
    """Circular xz-plane obstacles (x, z, radius) for the SDF avoidance task
    (reference keyframe_pattern.py:133-141)."""
    return [(4.0, 1.5, 0.7), (0.7, 1.5, 0.6)]


# ---- target builders (condition.py:10-31) ---------------------------------- #
def kframes_to_target(kframes, batch_size: int, n_frames: int):
    """(frame,(x,z)) list → target [B,T,22,3] (pelvis xz set) + mask."""
    target = np.zeros((batch_size, n_frames, 22, 3), np.float32)
    mask = np.zeros((batch_size, n_frames, 22, 3), bool)
    for frame, (x, z) in kframes:
        if frame >= n_frames:
            continue
        target[:, frame, 0, 0] = x
        target[:, frame, 0, 2] = z
        mask[:, frame, 0, 0] = True
        mask[:, frame, 0, 2] = True
    return jnp.asarray(target), jnp.asarray(mask)


def interpolate_kframes_trajectory(kframes, n_frames: int) -> np.ndarray:
    """Point-to-point linear xz trajectory through the keyframes
    (reference get_inpainting_motion's p2p imputation path)."""
    frames = np.array([k for k, _ in kframes])
    xs = np.array([p[0] for _, p in kframes])
    zs = np.array([p[1] for _, p in kframes])
    t = np.arange(n_frames)
    x = np.interp(t, frames, xs)
    z = np.interp(t, frames, zs)
    return np.stack([x, z], axis=-1).astype(np.float32)  # [T, 2]


# ---- gradient guidance (condition.py:458 CondKeyLocations) ------------------ #
@dataclass
class CondKeyLocations:
    """cond_loss_fn factory: masked pelvis-xz loss against a target.

    Use: loss_fn = CondKeyLocations(target, target_mask, stats, ...).loss_fn
         ddpm_sample_loop(..., cond_loss_fn=loss_fn, cond_scale=classifier_scale)
    """

    target: Array  # [B, T, 22, 3]
    target_mask: Array  # [B, T, 22, 3] bool
    stats: NormStats  # denormalization for the model's feature space
    abs_3d: bool = True
    traj_only: bool = False
    use_mse_loss: bool = False
    stop_cond_from: int = 0
    motion_length_cut: float = 6.0

    def loss_fn(self, pred_xstart: Array, t: Array) -> Array:
        """pred_xstart: normalized features [B, T, F]; returns scalar loss."""
        cut = int(self.motion_length_cut * 20)
        feats = pred_xstart * jnp.asarray(self.stats.std[: pred_xstart.shape[-1]]) + jnp.asarray(
            self.stats.mean[: pred_xstart.shape[-1]]
        )
        if self.traj_only:
            # features are (rot, x, z, y): pelvis xz directly at channels 1:3
            traj = jnp.stack([feats[..., 1], feats[..., 2]], axis=-1)
        else:
            joints = recover_from_ric(feats, 22, abs_3d=self.abs_3d)
            traj = joints[:, :, 0, :][..., (0, 2)]  # pelvis xz [B, T, 2]
        B = traj.shape[0]
        tgt = self.target[:, :, 0, :][..., (0, 2)]
        msk = self.target_mask[:, :, 0, :][..., (0, 2)].astype(traj.dtype)
        traj, tgt, msk = traj[:, :cut], tgt[:, :cut], msk[:, :cut]
        err = (traj - tgt) ** 2 if self.use_mse_loss else jnp.abs(traj - tgt)
        loss = jnp.sum(err * msk) / jnp.maximum(jnp.sum(self.target_mask), 1) * B
        # stop gate (condition.py:503): no guidance below stop_cond_from
        gate = (t[0] >= self.stop_cond_from).astype(loss.dtype)
        return loss * gate


@dataclass
class CondKeyLocationsWithSdf(CondKeyLocations):
    """+ SDF obstacle-avoidance term (condition.py:581): circular obstacles
    (x, z, radius); penalizes trajectory points inside an obstacle."""

    obstacles: Sequence[tuple[float, float, float]] = ()
    sdf_weight: float = 5.0  # reference w_colli (condition.py:598)

    def loss_fn(self, pred_xstart: Array, t: Array) -> Array:
        base = CondKeyLocations.loss_fn(self, pred_xstart, t)
        cut = int(self.motion_length_cut * 20)
        feats = pred_xstart * jnp.asarray(self.stats.std[: pred_xstart.shape[-1]]) + jnp.asarray(
            self.stats.mean[: pred_xstart.shape[-1]]
        )
        if self.traj_only:
            # 4-dim trajectory features (rot, x, z, y): pelvis xz at 1:3
            traj = jnp.stack([feats[..., 1], feats[..., 2]], axis=-1)[:, :cut]
        else:
            joints = recover_from_ric(feats, 22, abs_3d=self.abs_3d)
            traj = joints[:, :cut, 0, :][..., (0, 2)]
        sdf_loss = 0.0
        for (ox, oz, r) in self.obstacles:
            d = jnp.linalg.norm(traj - jnp.asarray([ox, oz]), axis=-1)
            # reference condition.py:682: clamp(rad-dist,0).sum()/T * w_colli
            # — the per-frame normalization keeps the obstacle term at the
            # reference's relative weight vs the keyframe loss
            sdf_loss = sdf_loss + jnp.sum(jax.nn.relu(r - d)) / traj.shape[1]
        gate = (t[0] >= self.stop_cond_from).astype(base.dtype)
        return base + self.sdf_weight * sdf_loss * gate


# ---- two-stage generation (generate.py:94, :396+) --------------------------- #
def two_stage_generate(
    traj_pipe,
    motion_pipe,
    kframes,
    rng: Array,
    batch_size: int,
    n_frames: int,
    traj_stats: NormStats,
    motion_stats: NormStats,
    y_traj: dict,
    y_motion: dict,
    classifier_scale: float = 100.0,
    impute_until: int = 1,
    target: Optional[Array] = None,
    target_mask: Optional[Array] = None,
    obstacles: Optional[Sequence[tuple[float, float, float]]] = None,
    use_mse_loss: bool = False,
):
    """Stage 1: trajectory model guided toward keyframe targets.
    Stage 2: motion model imputing the generated root channels
    (reference get_inpainting_motion_from_traj, condition.py:294).

    Targets come from `kframes` (shared across the batch, the sample-CLI
    path) or directly from per-sample (target, target_mask) [B,T,22,3]
    arrays (the eval_humanml_condition protocol path)."""
    from condmdi_tpu.diffusion.sampling import ddpm_sample_loop
    from condmdi_tpu.sampling.pipeline import build_inpainting_state

    if target is None:
        target, target_mask = kframes_to_target(kframes, batch_size, n_frames)
    if obstacles:
        # sdf mode (reference generate.py:442): keyframe loss + obstacle SDF
        guide = CondKeyLocationsWithSdf(
            target, target_mask, traj_stats, abs_3d=True, traj_only=True,
            use_mse_loss=use_mse_loss, obstacles=tuple(obstacles),
        )
    else:
        guide = CondKeyLocations(
            target, target_mask, traj_stats, abs_3d=True, traj_only=True,
            use_mse_loss=use_mse_loss,
        )

    rng, r1, r2 = jax.random.split(rng, 3)
    traj_denoise = traj_pipe.denoiser(y_traj, 1.0)
    traj_out = ddpm_sample_loop(
        traj_denoise, traj_pipe.sched, traj_pipe.dcfg,
        (batch_size, n_frames, 4), r1,
        cond_loss_fn=guide.loss_fn, cond_scale=classifier_scale,
        sampler=traj_pipe.sampler,
    )

    # stage 2: build inpainting tensors — first 4 channels from the traj
    F = 263
    traj_denorm = np.asarray(traj_out) * traj_stats.std[:4] + traj_stats.mean[:4]
    motion_scaled = (traj_denorm - motion_stats.mean[:4]) / motion_stats.std[:4]
    inpaint_motion = jnp.zeros((batch_size, n_frames, F))
    inpaint_motion = inpaint_motion.at[..., :4].set(jnp.asarray(motion_scaled))
    inpaint_mask = jnp.zeros((batch_size, n_frames, F), bool).at[..., :4].set(True)

    inpaint = build_inpainting_state(
        inpaint_motion, inpaint_mask,
        imputate=True, stop_imputation_at=impute_until,
    )
    sample = motion_pipe.sample(
        r2, (batch_size, n_frames, F), y_motion, guidance_param=1.0,
        inpaint=inpaint,
    )
    return traj_out, sample
