"""a2m + AMASS long-tail tests: layouts, datasets, action-conditioned
training, a2m evaluation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestAmassMasks:
    def test_masks_match_reference(self, reference_path):
        import data_loaders.amass_utils as ref

        from condmdi_tpu.data import amass as ours

        for name in ("MAT_POS", "MAT_ROTMAT", "MAT_HEIGHT", "MAT_ROT6D", "MAT_ROT"):
            np.testing.assert_array_equal(
                getattr(ours, name), getattr(ref, name), err_msg=name
            )

    def test_joint_to_full_mask_amass(self, reference_path):
        import torch
        from utils.editing_util import joint_to_full_mask_amass as ref_fn

        from condmdi_tpu.data.amass import amass_joint_to_full_mask

        rng = np.random.default_rng(0)
        jm = rng.uniform(size=(2, 16, 24)) < 0.3
        ours = amass_joint_to_full_mask(jm, mode="all")
        theirs = ref_fn(
            torch.from_numpy(np.moveaxis(jm, 1, 2)[:, :, None, :]), mode="all"
        ).numpy()
        np.testing.assert_array_equal(ours, np.moveaxis(theirs[:, :, 0, :], 1, 2))

    def test_synthetic_amass(self):
        from condmdi_tpu.data.amass import AMASS_DIM, SyntheticAMASSDataset

        ds = SyntheticAMASSDataset(size=4, clip_length=32)
        assert ds[0]["motion"].shape == (32, AMASS_DIM)


class TestA2M:
    def test_dataset_rot6d_layout(self):
        from condmdi_tpu.data.a2m import SyntheticA2MDataset

        ds = SyntheticA2MDataset(size=6, num_frames=32)
        s = ds[0]
        assert s["motion"].shape == (32, 150)
        assert 0 <= s["action"] < 12

    def test_axis_angle_conversion(self):
        from condmdi_tpu.data.a2m import axis_angle_poses_to_rot6d

        poses = np.zeros((8, 24, 3), np.float32)
        trans = np.ones((8, 3), np.float32)
        out = axis_angle_poses_to_rot6d(poses, trans)
        assert out.shape == (8, 25, 6)
        # identity rotation → 6d = (1,0,0, 0,1,0)
        np.testing.assert_allclose(out[0, 0], [1, 0, 0, 0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(out[0, 24, :3], 1.0)

    def test_a2m_evaluation(self):
        from condmdi_tpu.data.a2m import SyntheticA2MDataset
        from condmdi_tpu.evals.a2m import A2MClassifier, evaluate_a2m

        ds = SyntheticA2MDataset(size=24, num_frames=32)
        motions = np.stack([ds[i]["motion"] for i in range(24)])
        lengths = np.full(24, 32)
        actions = np.array([ds[i]["action"] for i in range(24)])
        clf = A2MClassifier.random_init(input_dim=150, num_actions=12)
        out = evaluate_a2m(
            clf, motions, lengths, actions, motions, lengths, actions,
            diversity_times=8,
        )
        assert set(out) == {"accuracy", "fid", "diversity"}
        assert out["fid"] < 1e-3  # identical distributions
        assert np.isfinite(out["diversity"])

    @pytest.mark.slow  # action-conditioned MDM forward (~20 s)
    def test_action_conditioned_mdm(self):
        """MDM with action conditioning (humanact12 table: 25×6, action emb)."""
        from condmdi_tpu.models import MDM

        B, T = 2, 16
        model = MDM(
            njoints=25, nfeats=6, latent_dim=32, ff_size=64, num_layers=1,
            num_heads=2, cond_mode="action", num_actions=12,
        )
        x = jnp.zeros((B, T, 150))
        t = jnp.zeros((B,), jnp.int32)
        y = {"action": jnp.asarray([3, 7])}
        params = model.init(jax.random.key(0), x, t, y)
        out = model.apply(params, x, t, y)
        assert out.shape == (B, T, 150)
        out2 = model.apply(params, x, t, {"action": jnp.asarray([1, 2])})
        assert not np.allclose(np.asarray(out), np.asarray(out2))
