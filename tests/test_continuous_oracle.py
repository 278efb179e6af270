"""Oracle-integration regressions for the continuous (endpoint /
vector-field) samplers.

With a perfect oracle network, Euler integration of the marginal vector
field must transport prior draws onto the data point:

  * endpoint: the net returns the true endpoint (x1, one-hot categories);
    vf = alpha'/(1-alpha) * (x1_hat - x_t)  (vector_field.py:567-569)
  * vector-field: the net returns the conditional velocity
    alpha'*(x1-x0)/(1)... expressed through the net contract
    dst['x'] = v + x_t (VectorField.forward subtracts x_t,
    vector_field.py:600-605) and dst[a/c/e] = v directly.

These pin down `FlowMol._integrate_continuous` (step math, dt handling,
edge symmetrization, CoM projection) end to end, independently of any
trained weights — the quality of a trained model is then purely a
learning question, not an integrator question.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.fm.interpolant import FEAT_INDEX, InterpolantSchedule
from flowmol_tpu.model import FlowMol, FlowMolConfig
from flowmol_tpu.nn.vector_field import VectorFieldConfig
from flowmol_tpu.fm import ctmc

B, N, KA, KC, KE = 8, 9, 5, 6, 4


def _mk_model(parameterization: str, schedule: InterpolantSchedule) -> FlowMol:
    vf = VectorFieldConfig(
        n_atom_types=KA, n_charges=KC, n_bond_types=KE,
        n_hidden_scalars=8, n_hidden_edge_feats=8, n_vec_channels=4,
        self_conditioning=False)
    cfg = FlowMolConfig(
        atom_type_map=("C", "H", "N", "O", "F"),
        parameterization=parameterization,
        schedule=schedule, vf=vf,
        prior_config={
            "x": {"align": False, "type": "centered-normal",
                  "kwargs": {"std": 1.0}},
            "a": {"align": False, "type": "gaussian", "kwargs": {"std": 1.0}},
            "c": {"align": False, "type": "gaussian", "kwargs": {"std": 1.0}},
            "e": {"align": False, "type": "gaussian", "kwargs": {"std": 1.0}},
        })
    return FlowMol(cfg)


def _targets(rng):
    x1 = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    x1 = x1 - x1.mean(1, keepdims=True)
    a1 = jnp.asarray(rng.integers(0, KA, (B, N)))
    c1 = jnp.asarray(rng.integers(0, KC, (B, N)))
    e_up = jnp.asarray(rng.integers(0, KE, (B, N * (N - 1) // 2)))
    e1 = ctmc.upper_to_dense(jax.nn.one_hot(e_up, KE), N)
    return x1, a1, c1, e_up, e1


class _EndpointOracle:
    """Stub MolGVPNet: always returns the true endpoint."""

    def __init__(self, x1, a1, c1, e1):
        self.dst = {"x": x1, "a": jax.nn.one_hot(a1, KA),
                    "c": jax.nn.one_hot(c1, KC), "e": e1}

    def apply(self, params, x, a, c, e, t, node_mask, **kw):
        return dict(self.dst)


class _VelocityOracle:
    """Stub net for the vector-field contract: conditional velocity
    alpha'/(1-alpha)*(x1 - x_t), with dst['x'] = v + x_t (the model
    subtracts x_t back, model.py:759-761)."""

    def __init__(self, cfg: FlowMolConfig, x1, a1, c1, e1):
        self.schedule = cfg.schedule
        self.x1 = {"x": x1, "a": jax.nn.one_hot(a1, KA),
                   "c": jax.nn.one_hot(c1, KC), "e": e1}

    def apply(self, params, x, a, c, e, t, node_mask, **kw):
        alpha = self.schedule.alpha_t(t)          # (B, 4)
        ap = self.schedule.alpha_t_prime(t)
        st = {"x": x, "a": a, "c": c, "e": e}
        out = {}
        for feat in ("x", "a", "c", "e"):
            i = FEAT_INDEX[feat]
            coef = (ap[:, i] / jnp.maximum(1.0 - alpha[:, i], 1e-9))
            coef = coef.reshape((-1,) + (1,) * (self.x1[feat].ndim - 1))
            v = coef * (self.x1[feat] - st[feat])
            out[feat] = v + x if feat == "x" else v
        return out


@pytest.mark.parametrize("sched", ["linear", "cosine"])
def test_endpoint_oracle_transports_prior_to_target(sched):
    schedule = (InterpolantSchedule() if sched == "linear"
                else InterpolantSchedule.from_config({
                    "schedule_type": {k: "cosine" for k in "xace"},
                    "cosine_params": {"x": 2.0, "a": 1.0, "c": 1.0, "e": 1.0}}))
    model = _mk_model("endpoint", schedule)
    rng = np.random.default_rng(0)
    x1, a1, c1, e_up, e1 = _targets(rng)
    model.net = _EndpointOracle(x1, a1, c1, e1)

    node_mask = jnp.ones((B, N), bool)
    prior = model.sample_prior(jax.random.PRNGKey(1), node_mask)
    final = model.integrate(None, jax.random.PRNGKey(2), prior, node_mask,
                            n_timesteps=250)

    assert float(jnp.abs(final["x"] - x1).max()) < 0.05
    assert bool((jnp.argmax(final["a"], -1) == a1).all())
    assert bool((jnp.argmax(final["c"], -1) == c1).all())
    fe = ctmc.edges_to_upper(final["e"], N)
    assert bool((jnp.argmax(fe, -1) == e_up).all())
    # most probability mass lands on the target class
    assert float(jnp.take_along_axis(final["a"], a1[..., None], -1).mean()) > 0.9


def test_vector_field_oracle_transports_prior_to_target():
    model = _mk_model("vector-field", InterpolantSchedule())
    rng = np.random.default_rng(3)
    x1, a1, c1, e_up, e1 = _targets(rng)
    model.net = _VelocityOracle(model.cfg, x1, a1, c1, e1)

    node_mask = jnp.ones((B, N), bool)
    prior = model.sample_prior(jax.random.PRNGKey(4), node_mask)
    final = model.integrate(None, jax.random.PRNGKey(5), prior, node_mask,
                            n_timesteps=250)

    # positions land on x1 up to the per-step CoM projection (x1 is CoM-free
    # so the projection is a no-op on the target)
    assert float(jnp.abs(final["x"] - x1).max()) < 0.05
    assert bool((jnp.argmax(final["a"], -1) == a1).all())
    assert bool((jnp.argmax(final["c"], -1) == c1).all())
    fe = ctmc.edges_to_upper(final["e"], N)
    assert bool((jnp.argmax(fe, -1) == e_up).all())
