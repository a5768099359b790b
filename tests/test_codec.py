"""Golden tests for the HumanML3D 263-dim codec vs the reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from condmdi_tpu.data import (
    HML_FEATURE_DIM,
    HML_LOWER_BODY_MASK,
    HML_ROOT_MASK,
    MAT_CNT,
    MAT_POS,
    MAT_ROT,
    MAT_VEL,
    extract_features,
    recover_from_ric,
    recover_root_rot_pos,
)
from condmdi_tpu.geometry import Skeleton, T2M_KINEMATIC_CHAIN, T2M_RAW_OFFSETS

RNG = np.random.default_rng(7)


def random_features(shape_prefix, T):
    return (RNG.normal(size=shape_prefix + (T, HML_FEATURE_DIM)) * 0.3).astype(
        np.float32
    )


def plausible_motion(T=48):
    """Generate a smooth plausible 22-joint motion via FK on random walks."""
    skel = Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
    offsets = (T2M_RAW_OFFSETS * RNG.uniform(0.2, 0.5, size=(22, 1))).astype(
        np.float32
    )
    # smooth quaternion trajectories: random walk then normalize
    base = RNG.normal(size=(1, 22, 4))
    steps = RNG.normal(size=(T, 22, 4)) * 0.05
    q = base + np.cumsum(steps, axis=0)
    q = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)
    root = np.cumsum(RNG.normal(size=(T, 3)) * 0.02, axis=0).astype(np.float32)
    root[:, 1] += 0.9
    joints = np.asarray(
        skel.forward_kinematics(jnp.asarray(q), jnp.asarray(root), jnp.asarray(offsets))
    )
    return joints.astype(np.float64)


class TestLayoutMasks:
    def test_masks_match_reference(self, reference_path):
        import data_loaders.humanml_utils as ref

        np.testing.assert_array_equal(HML_ROOT_MASK, ref.HML_ROOT_MASK)
        np.testing.assert_array_equal(HML_LOWER_BODY_MASK, ref.HML_LOWER_BODY_MASK)
        np.testing.assert_array_equal(MAT_POS, ref.MAT_POS)
        np.testing.assert_array_equal(MAT_ROT, ref.MAT_ROT)
        np.testing.assert_array_equal(MAT_VEL, ref.MAT_VEL)
        np.testing.assert_array_equal(MAT_CNT, ref.MAT_CNT)


class TestRecover:
    @pytest.fixture(autouse=True)
    def _ref(self, reference_path):
        import torch
        from data_loaders.humanml.scripts import motion_process as ref_mp

        self.torch = torch
        self.ref_mp = ref_mp

    @pytest.mark.parametrize("abs_3d", [False, True])
    def test_recover_root_rot_pos(self, abs_3d):
        data = random_features((3,), 32)
        ours_q, ours_p = recover_root_rot_pos(jnp.asarray(data), abs_3d=abs_3d)
        theirs_q, theirs_p = self.ref_mp.recover_root_rot_pos(
            self.torch.from_numpy(data), abs_3d=abs_3d
        )
        np.testing.assert_allclose(np.asarray(ours_q), theirs_q.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours_p), theirs_p.numpy(), atol=1e-5)

    @pytest.mark.parametrize("abs_3d", [False, True])
    def test_recover_from_ric(self, abs_3d):
        data = random_features((2,), 40)
        ours = recover_from_ric(jnp.asarray(data), 22, abs_3d=abs_3d)
        theirs = self.ref_mp.recover_from_ric(
            self.torch.from_numpy(data), 22, abs_3d=abs_3d
        )
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)

    def test_recover_from_ric_batchless(self):
        data = random_features((), 24)
        ours = recover_from_ric(jnp.asarray(data), 22)
        theirs = self.ref_mp.recover_from_ric(self.torch.from_numpy(data), 22)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


class TestExtractFeatures:
    @pytest.fixture(autouse=True)
    def _ref(self, reference_path):
        import torch
        from data_loaders.humanml.scripts import motion_process as ref_mp
        from data_loaders.humanml.utils import paramUtil

        self.torch = torch
        self.ref_mp = ref_mp
        self.paramUtil = paramUtil

    @pytest.mark.slow
    def test_extract_features_matches_reference(self):
        joints = plausible_motion(40)
        theirs = self.ref_mp.extract_features(
            joints.copy(),
            0.002,
            self.torch.from_numpy(T2M_RAW_OFFSETS),
            T2M_KINEMATIC_CHAIN,
            [2, 1, 17, 16],
            [8, 11],
            [7, 10],
        )
        ours = np.asarray(
            extract_features(jnp.asarray(joints.astype(np.float32)), 0.002)
        )
        assert ours.shape == theirs.shape == (39, HML_FEATURE_DIM)
        np.testing.assert_allclose(ours, theirs, atol=5e-3)

    def test_round_trip_relative(self):
        """recover_from_ric(extract_features(x)) reproduces the motion in the
        canonical (origin-centred, Z+-facing) frame."""
        joints = plausible_motion(40)
        feats = extract_features(jnp.asarray(joints.astype(np.float32)), 0.002)
        rec = np.asarray(recover_from_ric(feats, 22))
        # reference property: recovered joints match original up to the
        # initial root translation/yaw normalization; compare bone lengths
        skel = Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
        for j in range(1, 22):
            p = skel.parents[j]
            orig = np.linalg.norm(joints[:39, j] - joints[:39, p], axis=-1)
            got = np.linalg.norm(rec[:, j] - rec[:, p], axis=-1)
            np.testing.assert_allclose(got, orig, atol=2e-2)
