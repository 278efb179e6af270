"""Native C++ OT coupling vs the scipy reference path."""

import time

import numpy as np
import pytest

from flowmol_tpu.ops import ot_native

pytestmark = pytest.mark.skipif(not ot_native.available(),
                                reason="native toolchain unavailable")


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(0)
    for n in (3, 10, 44, 120):
        cost = rng.random((n, n))
        ours = ot_native.hungarian(cost)
        _, ref = linear_sum_assignment(cost)
        # assignments may differ on ties; compare objective values
        assert cost[np.arange(n), ours].sum() == pytest.approx(
            cost[np.arange(n), ref].sum(), abs=1e-9)
        assert len(set(ours.tolist())) == n  # a permutation


def test_kabsch_matches_numpy():
    from flowmol_tpu.data.priors import np_rigid_align
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((25, 3))
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    x1 = x0 @ q.T + np.array([0.5, -1.0, 2.0])
    ours = ot_native.kabsch(x0, x1)
    ref = np_rigid_align(x0, x1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    np.testing.assert_allclose(ours, x1, atol=1e-6)


def test_couple_batch_reduces_cost_and_threads():
    rng = np.random.default_rng(2)
    n_mols, max_n = 32, 48
    ns = rng.integers(5, max_n + 1, n_mols).astype(np.int32)
    priors = rng.standard_normal((n_mols, max_n, 3))
    dsts = rng.standard_normal((n_mols, max_n, 3))
    out = ot_native.couple_batch(priors, dsts, ns, rigid_body=True,
                                 n_threads=4)
    for m in range(n_mols):
        n = ns[m]
        before = np.linalg.norm(priors[m, :n] - dsts[m, :n])
        after = np.linalg.norm(out[m, :n] - dsts[m, :n])
        assert after < before
        # untouched padding
        np.testing.assert_array_equal(out[m, n:], priors[m, n:])


def test_native_beats_or_matches_scipy_speed():
    """Not a strict benchmark; sanity that the native path isn't pathological."""
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(3)
    cost = rng.random((150, 150))
    t0 = time.perf_counter()
    for _ in range(5):
        ot_native.hungarian(cost)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        linear_sum_assignment(cost)
    t_scipy = time.perf_counter() - t0
    assert t_native < t_scipy * 20  # generous bound; just catch regressions
