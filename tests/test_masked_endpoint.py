"""Masked-prior endpoint parameterization: linear interpolation from the mask
vertex of the (K+1)-simplex to the true vertex, CE loss over the K real
classes.

This is the only categorical prior the current reference's config validation
permits for any parameterization (flowmol.py:190-193), but its
EndpointVectorField cannot actually run it: sample_conditional_path would
shape-mismatch the (K+1)-dim ctmc prior against the K-dim one-hot target
(vector_field.py:576-590).  Here the combination is implemented to
completion — as a masked discrete flow on the (K+1)-simplex — and is
oracle-verified below; it ships as EXPERIMENTAL (no trained artifact clears
a quality bar; see FlowMolConfig.cat_prior_masked for why the naive linear
path cannot learn and what the implementation does instead).  For production
endpoint-parameterization models use the simplex priors
(configs/qm9_endpoint_v3.yml); for masked flows use ctmc.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.model import FlowMol
from tests.helpers import random_batch, tiny_config

# compile-heavy: excluded from the fast gate (pyproject test tiers)
pytestmark = pytest.mark.heavy


MASKED_PRIOR = {
    "x": {"align": True, "type": "centered-normal", "kwargs": {"std": 1.0}},
    "a": {"align": False, "type": "ctmc", "kwargs": {}},
    "c": {"align": False, "type": "ctmc", "kwargs": {}},
    "e": {"align": False, "type": "ctmc", "kwargs": {}},
}


def masked_cfg(**kw):
    cfg = tiny_config(parameterization="endpoint", **kw)
    return dataclasses.replace(cfg, prior_config=MASKED_PRIOR)


def test_conditional_path_is_bernoulli_masking_on_the_simplex():
    """The masked-endpoint conditional path is the CTMC Bernoulli draw
    expressed as simplex vertices: each token is EITHER the mask vertex
    (w.p. 1-alpha) or its true-class vertex (w.p. alpha).  A deterministic
    linear path (mask mass exactly 1-alpha per node) is intentionally NOT
    used — it leaks the target class and trains a copy network (see
    FlowMolConfig.cat_prior_masked)."""
    cfg = masked_cfg()
    assert cfg.cat_prior_masked
    model = FlowMol(cfg)
    B, N = 64, 8
    batch = random_batch(B=B, N=N, cfg=cfg)
    t = jnp.full((B,), 0.4)
    state = model.sample_conditional_path(jax.random.PRNGKey(0), batch, t)
    alpha = np.asarray(cfg.schedule.alpha_t(t))
    nm = np.asarray(batch.node_mask)
    for feat, idx, kk, tgt in (("a", 1, cfg.n_atom_types, batch.a1),
                               ("c", 2, cfg.n_atom_charges, batch.c1)):
        s = np.asarray(state[feat])
        assert s.shape[-1] == kk + 1
        # every state is a vertex of the (K+1)-simplex
        np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)
        assert set(np.unique(s)) <= {0.0, 1.0}
        masked = s[..., -1][nm.astype(bool)]
        # mask fraction matches 1 - alpha (binomial CI over B*N draws)
        frac = masked.mean()
        want = 1.0 - alpha[0, idx]
        n_draws = masked.size
        assert abs(frac - want) < 4 * np.sqrt(want * (1 - want) / n_draws)
        # unmasked tokens carry their true class
        tok = s.argmax(-1)
        real = (tok != kk) & nm.astype(bool)
        assert (tok[real] == np.asarray(tgt)[real]).all()


def test_loss_and_grads_finite():
    cfg = masked_cfg(self_conditioning=True)
    model = FlowMol(cfg)
    batch = random_batch(B=2, N=8, cfg=cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    grads = jax.grad(
        lambda p: model.loss_fn(p, batch, jax.random.PRNGKey(1))[0])(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_sampler_final_state_has_no_mask_tokens():
    """The masked endpoint samples through the discrete jump process, so the
    final state is integer tokens (like ctmc) and no mask token survives."""
    cfg = masked_cfg(self_conditioning=True)
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    node_mask = jnp.ones((2, 6), bool)
    fn = jax.jit(model.make_sample_fn(n_timesteps=8))
    final = fn(params, jax.random.PRNGKey(1), node_mask)
    a, c, e_up = (np.asarray(final[k]) for k in ("a", "c", "e_up"))
    assert a.shape == (2, 6) and (a >= 0).all() and (a < cfg.n_atom_types).all()
    assert c.shape == (2, 6) and (c < cfg.n_atom_charges).all()
    assert e_up.shape == (2, 15) and (e_up < cfg.n_bond_types).all()
    assert np.isfinite(np.asarray(final["x"])).all()
    from flowmol_tpu.analysis.molecule_builder import \
        molecules_from_sampled_state
    mols = molecules_from_sampled_state(
        {k: np.asarray(v) for k, v in final.items()}, np.asarray(node_mask),
        cfg.atom_type_map, ctmc_mol=True)
    assert len(mols) == 2


def test_oracle_network_recovers_target():
    """With a perfect endpoint oracle, integration must land on the target
    molecule: the mask mass drains along 1 - alpha and argmax recovers the
    oracle's classes everywhere."""
    cfg = masked_cfg()
    model = FlowMol(cfg)
    B, N = 2, 6
    node_mask = jnp.ones((B, N), bool)
    rng = np.random.default_rng(3)
    a_tgt = jnp.asarray(rng.integers(0, cfg.n_atom_types, (B, N)))
    c_tgt = jnp.asarray(rng.integers(0, cfg.n_atom_charges, (B, N)))
    e_up = np.triu(rng.integers(0, cfg.n_bond_types, (B, N, N)), 1)
    e_tgt = jnp.asarray(e_up + e_up.swapaxes(1, 2))
    x_tgt = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    x_tgt = x_tgt - x_tgt.mean(1, keepdims=True)

    class Oracle:
        def apply(self, params, x, a, c, e, t, nm, method=None, **kw):
            dst = {"x": x_tgt,
                   "a": jax.nn.one_hot(a_tgt, cfg.n_atom_types),
                   "c": jax.nn.one_hot(c_tgt, cfg.n_atom_charges),
                   "e": jax.nn.one_hot(e_tgt, cfg.n_bond_types)}
            return dst

    model.net = Oracle()
    prior = model.sample_prior(jax.random.PRNGKey(0), node_mask)
    final = model.integrate({}, jax.random.PRNGKey(1), prior, node_mask,
                            n_timesteps=64)
    assert (np.asarray(final["a"]) == np.asarray(a_tgt)).all()
    assert (np.asarray(final["c"]) == np.asarray(c_tgt)).all()
    iu = np.triu_indices(N, 1)
    ef = np.asarray(final["e_up"])
    assert (ef == np.asarray(e_tgt)[:, iu[0], iu[1]]).all()
    # positions converge to the oracle's endpoint
    assert float(np.abs(np.asarray(final["x"]) - np.asarray(x_tgt)).max()) < 0.15


def test_masked_prior_rejected_for_vf_and_dirichlet():
    from flowmol_tpu.model import FlowMolConfig
    base = {
        "dataset": {"atom_map": ["C", "H", "N", "O", "F"]},
        "mol_fm": {"parameterization": "vector-field",
                   "prior_config": MASKED_PRIOR},
        "interpolant_scheduler": {"schedule_type": "linear"},
    }
    with pytest.raises(NotImplementedError):
        FlowMolConfig.from_config(base)
    base["mol_fm"]["parameterization"] = "dirichlet"
    with pytest.raises(NotImplementedError):
        FlowMolConfig.from_config(base)
