"""Keyframe mask generator: exact parity (deterministic modes) + property
tests (random modes) against reference utils/editing_util.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.training import get_keyframes_mask, joint_to_full_mask

B, T, F = 3, 60, 263
LENGTHS = np.array([60, 45, 23])


def ref_mask(reference_path, edit_mode, lengths=LENGTHS, T=T, **kw):
    import torch
    from utils.editing_util import get_keyframes_mask as ref_get

    data = torch.zeros((len(lengths), 263, 1, T))
    out = ref_get(data, torch.from_numpy(np.asarray(lengths)), edit_mode=edit_mode, **kw)
    if isinstance(out, tuple):
        out = out[0]
    # [B, 263, 1, T] -> [B, T, 263]
    return np.moveaxis(out.numpy()[:, :, 0, :], 1, 2)


DETERMINISTIC_MODES = [
    "benchmark_sparse",
    "benchmark_clip",
    "uncond",
    "right_wrist",
    "lower_body",
    "pelvis_feet",
    "pelvis_vr",
    "pelvis",
]


class TestDeterministicModes:
    @pytest.mark.parametrize("mode", DETERMINISTIC_MODES)
    def test_exact_parity(self, reference_path, mode):
        theirs = ref_mask(reference_path, mode)
        ours = np.asarray(
            get_keyframes_mask(
                jax.random.key(0), jnp.asarray(LENGTHS), T, edit_mode=mode
            )
        )
        np.testing.assert_array_equal(ours, theirs, err_msg=mode)

    @pytest.mark.parametrize("fmode", ["pos", "pos_rot", "pos_rot_vel"])
    def test_feature_modes(self, reference_path, fmode):
        theirs = ref_mask(reference_path, "benchmark_sparse", feature_mode=fmode)
        ours = np.asarray(
            get_keyframes_mask(
                jax.random.key(0), jnp.asarray(LENGTHS), T,
                edit_mode="benchmark_sparse", feature_mode=fmode,
            )
        )
        np.testing.assert_array_equal(ours, theirs)

    def test_trans_length(self, reference_path):
        theirs = ref_mask(reference_path, "benchmark_sparse", trans_length=5)
        ours = np.asarray(
            get_keyframes_mask(
                jax.random.key(0), jnp.asarray(LENGTHS), T,
                edit_mode="benchmark_sparse", trans_length=5,
            )
        )
        np.testing.assert_array_equal(ours, theirs)


class TestRandomModes:
    def _mask(self, mode, seed=0):
        return np.asarray(
            get_keyframes_mask(
                jax.random.key(seed), jnp.asarray(LENGTHS), T, edit_mode=mode
            )
        )

    def test_gmd_keyframes_counts(self):
        m = self._mask("gmd_keyframes")
        # joint->feature expansion observes every feature except nothing; each
        # selected frame is fully observed → per-frame all-or-nothing
        frame_any = m.any(axis=2)
        frame_all = m.all(axis=2)
        np.testing.assert_array_equal(frame_any, frame_all)
        assert (frame_any.sum(axis=1) == 5).all()
        for i, ln in enumerate(LENGTHS):
            assert not frame_any[i, ln:].any()

    def test_random_frames_counts(self):
        m = self._mask("random_frames")
        frame_any = m.any(axis=2)
        assert (frame_any.sum(axis=1) == np.minimum(20, LENGTHS)).all()

    def test_random_joints_properties(self):
        m = self._mask("random_joints")
        frame_any = m.any(axis=2)
        # root features observed on every keyframe (root always set)
        root_cols = np.zeros(F, bool)
        root_cols[0:4] = True  # MAT_POS row0 -> 1:4; MAT_ROT row0 -> 0
        for i, ln in enumerate(LENGTHS):
            assert not frame_any[i, ln:].any()
            kf = np.where(frame_any[i])[0]
            assert (m[i, kf][:, 1:4]).all()  # root pos features

    def test_random_mode_properties(self):
        m = self._mask("random")
        frame_any = m.any(axis=2)
        for i, ln in enumerate(LENGTHS):
            assert not frame_any[i, ln:].any()
            kf = np.where(frame_any[i])[0]
            # no keyframe is completely full (forced removal) and each
            # selected keyframe is non-empty by construction
            counts = m[i, kf].sum(axis=1)
            assert (counts > 0).all()
            assert (counts < F).all()

    def test_different_seeds_differ(self):
        a = self._mask("random_frames", seed=0)
        b = self._mask("random_frames", seed=1)
        assert not np.array_equal(a, b)


class TestJointToFullMask:
    def test_matches_reference(self, reference_path):
        import torch
        from utils.editing_util import joint_to_full_mask as ref_j2f

        rng = np.random.default_rng(0)
        jm = rng.uniform(size=(B, T, 22)) < 0.3
        for mode in ("pos", "pos_rot", "pos_rot_vel"):
            ours = np.asarray(joint_to_full_mask(jnp.asarray(jm), mode))
            theirs = ref_j2f(
                torch.from_numpy(np.moveaxis(jm, 1, 2)[:, :, None, :]), mode=mode
            ).numpy()
            np.testing.assert_array_equal(ours, np.moveaxis(theirs[:, :, 0, :], 1, 2))
