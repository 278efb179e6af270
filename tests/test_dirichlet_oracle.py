"""Oracle-integration regression for the Dirichlet marginal vector field.

With a perfect endpoint oracle (p1 = one-hot of the target class), iterating
`dirichlet_marginal_step` over the sampling w-grid must transport Dir(1,..,1)
prior draws onto the target vertex — argmax lands on the target for every
sample and most probability mass concentrates there.  This pins down the
betainc-derivative c_factor table + w-space Euler step end to end
(parity: DirichletVectorField.step, vector_field.py:700-803; c_factor,
dirflow.py:18-33), independently of any trained network.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.fm.dirichlet import (DirichletConditionalFlow,
                                      dirichlet_marginal_step)

# compile-heavy: excluded from the fast gate (pyproject test tiers)
pytestmark = pytest.mark.heavy


def test_oracle_endpoint_transports_prior_to_target():
    K, B, T, w_max = 5, 512, 100, 32.0
    flow = DirichletConditionalFlow.build(K=K, alpha_max=w_max + 2)

    rng = np.random.default_rng(0)
    g = rng.gamma(1.0, size=(B, K))
    x = jnp.asarray((g / g.sum(-1, keepdims=True)).astype(np.float32))
    target = rng.integers(0, K, size=B)
    p1 = jax.nn.one_hot(jnp.asarray(target), K)

    # the sampler's w grid (model._integrate_dirichlet: w = alpha*w_max + 1
    # on a linear alpha schedule)
    w = np.linspace(0.0, 1.0, T) * w_max + 1.0
    for i in range(T - 1):
        x = dirichlet_marginal_step(flow, x, p1, jnp.float32(w[i]),
                                    jnp.float32(w[i + 1]))

    acc = float((jnp.argmax(x, -1) == jnp.asarray(target)).mean())
    mass = float(jnp.take_along_axis(
        x, jnp.asarray(target)[:, None], -1).mean())
    # every sample must land on its target vertex, with most mass there
    assert acc == 1.0
    assert mass > 0.8

    # states stay on the simplex throughout (projection invariant)
    assert float(jnp.abs(x.sum(-1) - 1.0).max()) < 1e-5
    assert float(x.min()) >= 0.0


def test_c_factor_compact_table_matches_round4_density():
    """The compact bilinear table (0.1 alpha-spacing x 512 b-points, round 5
    — shrunk 25x because the embedded HLO constant made remote compiles take
    17 minutes) must reproduce the round-4-density table (0.01 x 1000,
    reference dirflow.py defaults) to a few percent.  Both share the
    reference's small-denominator zeroing guards, so this isolates pure
    interpolation error."""
    K = 5
    fine = DirichletConditionalFlow.build(K=K, alpha_max=34.0,
                                          alpha_spacing=0.01, n_bs=1000)
    compact = DirichletConditionalFlow.build(K=K, alpha_max=34.0)

    rng = np.random.default_rng(7)
    b = rng.uniform(0.02, 0.9, size=512).astype(np.float32)
    for alpha in (1.3, 4.7, 11.0, 25.0):
        got = np.asarray(compact.c_factor(jnp.asarray(b), jnp.float32(alpha)))
        want = np.asarray(fine.c_factor(jnp.asarray(b), jnp.float32(alpha)))
        scale = np.maximum(np.abs(want), np.quantile(np.abs(want), 0.5))
        rel = np.abs(got - want) / np.maximum(scale, 1e-6)
        assert np.quantile(rel, 0.95) < 0.05, (alpha, np.quantile(rel, 0.95))
        assert np.median(rel) < 0.02, (alpha, np.median(rel))
