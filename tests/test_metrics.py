"""Golden tests: evaluation metrics vs the reference implementations."""

import numpy as np
import pytest

from condmdi_tpu.evals import (
    calculate_R_precision,
    calculate_frechet_distance,
    calculate_keyframe_error,
    calculate_matching_score,
    calculate_skating_ratio,
    calculate_top_k,
    calculate_trajectory_diversity,
    calculate_trajectory_error,
    euclidean_distance_matrix,
    get_metric_statistics,
)

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def ref(reference_path):
    import data_loaders.humanml.utils.metrics as m

    return m


class TestEmbeddingMetrics:
    def test_distance_matrix(self, ref):
        a = RNG.standard_normal((12, 16))
        b = RNG.standard_normal((12, 16))
        np.testing.assert_allclose(
            euclidean_distance_matrix(a, b),
            ref.euclidean_distance_matrix(a, b),
            atol=1e-8, rtol=1e-6,
        )

    def test_r_precision(self, ref):
        a = RNG.standard_normal((20, 8))
        b = a + RNG.standard_normal((20, 8)) * 0.1
        ours = calculate_R_precision(a, b, 3, sum_all=True)
        theirs = ref.calculate_R_precision(a, b, 3, sum_all=True)
        np.testing.assert_array_equal(ours, theirs)

    def test_matching_score(self, ref):
        a = RNG.standard_normal((20, 8))
        b = RNG.standard_normal((20, 8))
        np.testing.assert_allclose(
            calculate_matching_score(a, b, sum_all=True),
            ref.calculate_matching_score(a, b, sum_all=True),
            rtol=1e-8,
        )

    def test_fid(self, ref):
        x = RNG.standard_normal((200, 16))
        y = RNG.standard_normal((200, 16)) + 0.3
        mu1, s1 = np.mean(x, axis=0), np.cov(x, rowvar=False)
        mu2, s2 = np.mean(y, axis=0), np.cov(y, rowvar=False)
        ours = calculate_frechet_distance(mu1, s1, mu2, s2)
        theirs = ref.calculate_frechet_distance(mu1, s1, mu2, s2)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)


class TestCondMDIMetrics:
    def test_keyframe_error(self, ref):
        err = np.abs(RNG.standard_normal((8, 10)))
        nk = RNG.integers(1, 10, size=8)
        np.testing.assert_allclose(
            calculate_keyframe_error(err, nk),
            float(ref.calculate_keyframe_error(err, nk)),
            rtol=1e-6,
        )

    @pytest.mark.parametrize("strict", [True, False])
    def test_trajectory_error(self, ref, strict):
        err = np.abs(RNG.standard_normal((8, 5))) * 0.3
        nk = np.full(8, 5)
        np.testing.assert_allclose(
            calculate_trajectory_error(err, nk, strict=strict),
            ref.calculate_trajectory_error(err, nk, strict=strict).astype(float),
            rtol=1e-6,
        )

    def test_trajectory_diversity(self, ref):
        trajs = RNG.standard_normal((6, 3, 40, 2))
        lengths = RNG.integers(10, 40, size=6)
        np.testing.assert_allclose(
            calculate_trajectory_diversity(trajs, lengths),
            ref.calculate_trajectory_diversity(trajs, lengths),
            rtol=1e-6,
        )

    def test_skating_ratio(self, ref):
        import torch

        motions_ref = RNG.standard_normal((4, 22, 3, 60)).astype(np.float32) * 0.2
        motions_ref[:, :, 1, :] = np.abs(motions_ref[:, :, 1, :]) * 0.3
        ours_ratio, ours_vel = calculate_skating_ratio(motions_ref, layout="ref")
        theirs_ratio, theirs_vel = ref.calculate_skating_ratio(
            torch.from_numpy(motions_ref)
        )
        np.testing.assert_allclose(ours_ratio, theirs_ratio, rtol=1e-6)
        np.testing.assert_allclose(ours_vel, theirs_vel, rtol=1e-5, atol=1e-6)

    def test_skating_layouts_agree(self):
        m = RNG.standard_normal((4, 22, 3, 60)).astype(np.float32)
        ours_ref, _ = calculate_skating_ratio(m, layout="ref")
        ours_btj, _ = calculate_skating_ratio(np.transpose(m, (0, 3, 1, 2)))
        np.testing.assert_allclose(ours_ref, ours_btj)


class TestStatistics:
    def test_mean_conf_interval(self):
        vals = RNG.standard_normal((20, 3))
        mean, ci = get_metric_statistics(vals, 20)
        np.testing.assert_allclose(mean, vals.mean(axis=0))
        np.testing.assert_allclose(ci, 1.96 * vals.std(axis=0) / np.sqrt(20))
