"""Distribution parity for the RANDOM keyframe-mask modes.

The deterministic modes are exact-parity tested in test_keyframes.py; the
random modes (`random`, `random_joints`, `gmd_keyframes`, `random_frames`)
define the TRAINING distribution of the conditional model, so a silent
drift here poisons any quality-parity claim. We draw thousands of masks
from our on-device generator (training/keyframes.py) and the reference's
numpy/torch generator (/root/reference/utils/editing_util.py:149-211) and
compare the defining statistics with two-sample KS tests:

  * keyframes per sample (any-feature-observed frames)
  * mean observed features per keyframe, PER SAMPLE
  * mean keyframe position per sample (uniformity over [0, length))

All statistics are computed per sample so the KS inputs are i.i.d. —
pooling individual keyframes would correlate observations within a sample
(they share num_features/K) and make KS reject even ref-vs-ref (verified:
pooled ref-vs-ref p=7e-17, per-sample p=0.32). The tests catch gross drift
(wrong bounds, off-by-one ranges, missing forced-mask adjustment) without
being flaky.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.training.keyframes import get_keyframes_mask

B = 3000
LENGTH = 48
T = 48
F = 263
P_MIN = 1e-4  # reject only on overwhelming evidence of drift



pytestmark = pytest.mark.slow  # protocol/e2e scale; fast gate skips

@pytest.fixture(scope="module")
def ref_mask_fn(reference_path):
    import torch
    from utils.editing_util import get_keyframes_mask as ref_get

    def sample(mode, seed, n_keyframes=5):
        np.random.seed(seed)
        torch.manual_seed(seed)
        data = torch.zeros((B, F, 1, T))
        lengths = torch.full((B,), LENGTH, dtype=torch.long)
        out = ref_get(
            data=data, lengths=lengths, edit_mode=mode,
            feature_mode="pos_rot_vel", n_keyframes=n_keyframes,
        )
        return np.moveaxis(out.numpy()[:, :, 0, :], 1, 2)  # [B, T, F]

    return sample


def our_masks(mode, seed, n_keyframes=5):
    m = get_keyframes_mask(
        jax.random.key(seed), jnp.full((B,), LENGTH), T,
        edit_mode=mode, feature_mode="pos_rot_vel", n_keyframes=n_keyframes,
    )
    return np.asarray(m)


def keyframe_counts(masks):  # [B]
    return masks.any(axis=2).sum(axis=1)


def mean_features_per_keyframe(masks):  # [B] (i.i.d. per-sample statistic)
    per_frame = masks.sum(axis=2)  # [B, T]
    kc = (per_frame > 0).sum(axis=1)
    return per_frame.sum(axis=1) / np.maximum(kc, 1)


def features_per_keyframe(masks):  # pooled (for range checks only, not KS)
    per_frame = masks.sum(axis=2)
    return per_frame[per_frame > 0]


def mean_keyframe_position(masks):  # [B]
    kf = masks.any(axis=2)  # [B, T]
    t = np.arange(masks.shape[1])
    return (kf * t).sum(axis=1) / np.maximum(kf.sum(axis=1), 1)


def assert_same_distribution(a, b, what):
    from scipy.stats import ks_2samp

    stat, p = ks_2samp(a, b)
    assert p > P_MIN, (
        f"{what}: KS p={p:.2e} (stat={stat:.4f}) — distribution drift vs "
        f"reference (ours mean={np.mean(a):.3f}, ref mean={np.mean(b):.3f})"
    )
    # additionally pin the first two moments within a few percent
    rel = abs(np.mean(a) - np.mean(b)) / max(abs(np.mean(b)), 1e-9)
    assert rel < 0.05, f"{what}: mean drift {rel:.3%}"


class TestRandomModeDistributions:
    def test_random_mode(self, ref_mask_fn):
        ours = our_masks("random", 0)
        ref = ref_mask_fn("random", 0)
        assert_same_distribution(
            keyframe_counts(ours), keyframe_counts(ref), "random: keyframes/sample"
        )
        assert_same_distribution(
            mean_features_per_keyframe(ours), mean_features_per_keyframe(ref),
            "random: features/keyframe",
        )
        # forced-mask adjustment: no empty and no full keyframes
        fpk_ours = features_per_keyframe(ours)
        fpk_ref = features_per_keyframe(ref)
        assert fpk_ours.min() >= 1 and fpk_ref.min() >= 1
        assert fpk_ours.max() < F and fpk_ref.max() < F

    def test_random_joints_mode(self, ref_mask_fn):
        ours = our_masks("random_joints", 1)
        ref = ref_mask_fn("random_joints", 1)
        assert_same_distribution(
            keyframe_counts(ours), keyframe_counts(ref),
            "random_joints: keyframes/sample",
        )
        assert_same_distribution(
            mean_features_per_keyframe(ours), mean_features_per_keyframe(ref),
            "random_joints: features/keyframe",
        )
        # root joint observed on every keyframe → root features present
        from condmdi_tpu.data import layout as L

        root_feats = np.asarray(L.HML_ROOT_MASK, dtype=bool)
        kf = ours.any(axis=2)
        assert (ours[kf][:, root_feats].all(axis=1)).all()

    def test_gmd_keyframes_positions_uniform(self, ref_mask_fn):
        ours = our_masks("gmd_keyframes", 2)
        ref = ref_mask_fn("gmd_keyframes", 2)
        np.testing.assert_array_equal(
            keyframe_counts(ours), np.full(B, 5)
        )
        np.testing.assert_array_equal(keyframe_counts(ref), np.full(B, 5))
        assert_same_distribution(
            mean_keyframe_position(ours), mean_keyframe_position(ref),
            "gmd_keyframes: positions",
        )

    def test_random_frames_positions(self, ref_mask_fn):
        ours = our_masks("random_frames", 3)
        ref = ref_mask_fn("random_frames", 3)
        np.testing.assert_array_equal(keyframe_counts(ours), np.full(B, 20))
        np.testing.assert_array_equal(keyframe_counts(ref), np.full(B, 20))
        assert_same_distribution(
            mean_keyframe_position(ours), mean_keyframe_position(ref),
            "random_frames: positions",
        )
