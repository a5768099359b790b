"""Unconstrained metrics: KID golden test vs reference, P/R sanity."""

import numpy as np
import pytest

from condmdi_tpu.evals.unconstrained import (
    calculate_kid,
    evaluate_unconstrained,
    polynomial_mmd,
    precision_and_recall,
)

RNG = np.random.default_rng(4)


class TestKID:
    @pytest.mark.slow
    def test_mmd_matches_reference(self, reference_path):
        pytest.importorskip("sklearn")
        from eval.unconstrained.metrics.kid import polynomial_mmd as ref_mmd

        g = RNG.standard_normal((40, 16))
        r = RNG.standard_normal((40, 16)) + 0.2
        ours = polynomial_mmd(g, r)
        theirs, _ = ref_mmd(g, r, var_at_m=40, ret_var=True)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    def test_kid_identical_distributions_near_zero(self):
        x = RNG.standard_normal((100, 8))
        mean, std = calculate_kid(x, x.copy(), n_subsets=5, subset_size=50)
        assert abs(mean) < 0.05

    def test_kid_detects_shift(self):
        x = RNG.standard_normal((100, 8))
        y = x + 2.0
        mean_same, _ = calculate_kid(x, x.copy(), n_subsets=5, subset_size=50)
        mean_diff, _ = calculate_kid(x, y, n_subsets=5, subset_size=50)
        assert mean_diff > mean_same + 1.0


class TestPrecisionRecall:
    def test_identical_sets_full_pr(self):
        x = RNG.standard_normal((60, 8))
        p, r = precision_and_recall(x, x.copy())
        assert p == 1.0 and r == 1.0

    def test_disjoint_sets_low_pr(self):
        x = RNG.standard_normal((60, 8))
        y = x + 100.0
        p, r = precision_and_recall(y, x)
        assert p < 0.1 and r < 0.1

    def test_bundle(self):
        g = RNG.standard_normal((80, 8))
        r = RNG.standard_normal((80, 8))
        out = evaluate_unconstrained(g, r, n_subsets=3, subset_size=40)
        assert set(out) == {"fid", "kid", "kid_std", "precision", "recall", "diversity"}
        assert all(np.isfinite(v) for v in out.values())
