"""Statistical tests for the CTMC machinery: masking rates, campbell-step
unmask probabilities, purity-sampling budgets, gat-step validity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.fm import ctmc

# compile-heavy: excluded from the fast gate (pyproject test tiers)
pytestmark = pytest.mark.heavy



def test_mask_tokens_rate():
    """Tokens are masked with probability 1 - alpha per graph."""
    rng = jax.random.PRNGKey(0)
    B, M, K = 4, 4000, 5
    x1 = jnp.zeros((B, M), jnp.int32)
    alpha = jnp.array([0.0, 0.3, 0.7, 1.0])
    out = ctmc.mask_tokens(rng, x1, alpha, mask_index=K)
    rates = np.asarray((out == K).mean(axis=1))
    np.testing.assert_allclose(rates, 1.0 - np.asarray(alpha), atol=0.03)


def test_campbell_unmask_probability():
    """Masked tokens unmask at rate dt*(a' + eta*a)/(1-a)."""
    rng = jax.random.PRNGKey(1)
    M = 20000
    xt = jnp.full((1, M), 4, jnp.int32)  # all masked (mask_index=4)
    p1 = jnp.ones((1, M, 4)) / 4.0
    alpha, alpha_prime, dt, eta = 0.5, 1.0, 0.1, 2.0
    out = ctmc.campbell_step(
        rng, p1, xt, stochasticity=eta, hc_thresh=0.0,
        alpha_t=jnp.asarray(alpha), alpha_t_prime=jnp.asarray(alpha_prime),
        dt=jnp.asarray(dt), mask_index=4,
        valid_mask=jnp.ones((1, M), bool), last_step=jnp.asarray(False))
    expected = dt * (alpha_prime + eta * alpha) / (1 - alpha)
    got = float((out.xt != 4).mean())
    assert got == pytest.approx(expected, abs=0.01)
    # unmasked values are sampled endpoints (uniform over 4 classes)
    vals = np.asarray(out.xt[out.xt != 4])
    counts = np.bincount(vals, minlength=4) / max(len(vals), 1)
    np.testing.assert_allclose(counts, 0.25, atol=0.03)


def test_campbell_remask_probability_and_last_step():
    """Unmasked tokens re-mask at rate dt*eta, except on the last step."""
    rng = jax.random.PRNGKey(2)
    M = 20000
    xt = jnp.zeros((1, M), jnp.int32)  # all unmasked (class 0)
    p1 = jnp.ones((1, M, 4)) / 4.0
    kwargs = dict(p1=p1, xt=xt, stochasticity=3.0, hc_thresh=0.0,
                  alpha_t=jnp.asarray(0.5), alpha_t_prime=jnp.asarray(1.0),
                  dt=jnp.asarray(0.1), mask_index=4,
                  valid_mask=jnp.ones((1, M), bool))
    out = ctmc.campbell_step(rng, last_step=jnp.asarray(False), **kwargs)
    assert float((out.xt == 4).mean()) == pytest.approx(0.3, abs=0.02)
    out_last = ctmc.campbell_step(rng, last_step=jnp.asarray(True), **kwargs)
    assert float((out_last.xt == 4).mean()) == 0.0


def test_purity_sampling_budget():
    """Expected unmask count matches the uniform schedule's budget, with
    high-confidence nodes preferred."""
    rng = jax.random.PRNGKey(3)
    B, M = 8, 1000
    xt = jnp.full((B, M), 3, jnp.int32)  # all masked (mask_index=3)
    # half the nodes high-confidence
    probs = np.full((B, M, 3), 1 / 3.0, np.float32)
    probs[:, :M // 2, 0] = 0.95
    probs[:, :M // 2, 1:] = 0.025
    p1 = jnp.asarray(probs)
    unmask_prob = jnp.asarray(0.2)
    will = ctmc.purity_sampling(rng, xt, p1, unmask_prob, mask_index=3,
                                valid_mask=jnp.ones((B, M), bool),
                                hc_thresh=0.9)
    will = np.asarray(will)
    # total budget: 0.2 * M per graph
    np.testing.assert_allclose(will.sum(1) / M, 0.2, atol=0.03)
    # all unmasking happens in the high-confidence half (budget < hc count)
    assert will[:, M // 2:].sum() == 0


def test_purity_sampling_overflows_to_low_confidence():
    """When the budget exceeds the hc pool, lc nodes absorb the remainder."""
    rng = jax.random.PRNGKey(4)
    B, M = 4, 1000
    xt = jnp.full((B, M), 3, jnp.int32)
    probs = np.full((B, M, 3), 1 / 3.0, np.float32)
    probs[:, :100, 0] = 0.95  # only 10% high-confidence
    p1 = jnp.asarray(probs)
    will = np.asarray(ctmc.purity_sampling(
        rng, xt, p1, jnp.asarray(0.5), mask_index=3,
        valid_mask=jnp.ones((B, M), bool), hc_thresh=0.9))
    # all hc nodes unmask (ph = 1), lc makes up the rest
    assert will[:, :100].mean() > 0.99
    np.testing.assert_allclose(will.sum(1) / M, 0.5, atol=0.04)


def test_gat_step_valid_tokens():
    rng = jax.random.PRNGKey(5)
    M = 1000
    xt = jnp.full((1, M), 4, jnp.int32)
    p1 = jax.nn.softmax(jax.random.normal(rng, (1, M, 4)), -1)
    out = ctmc.gat_step(rng, p1, xt, alpha_t=jnp.asarray(0.5),
                        alpha_t_prime=jnp.asarray(1.0), fw=jnp.asarray(2.0),
                        dt=jnp.asarray(0.05), mask_index=4,
                        valid_mask=jnp.ones((1, M), bool))
    assert int(out.xt.min()) >= 0 and int(out.xt.max()) <= 4


def test_upper_tri_roundtrip():
    n = 7
    rng = np.random.default_rng(0)
    up = rng.integers(0, 5, (3, n * (n - 1) // 2))
    dense = ctmc.upper_to_dense(jnp.asarray(up), n)
    assert (np.asarray(dense) == np.asarray(dense).swapaxes(1, 2)).all()
    back = ctmc.edges_to_upper(dense, n)
    np.testing.assert_array_equal(np.asarray(back), up)


def test_sharpen_limits():
    p = jnp.array([[0.6, 0.3, 0.1]])
    sharp = ctmc.sharpen(p, jnp.asarray(0.05))
    assert float(sharp[0, 0]) > 0.999  # low temperature -> argmax
    mild = ctmc.sharpen(p, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(mild), np.asarray(p), atol=1e-5)
