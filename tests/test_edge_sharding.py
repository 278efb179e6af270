"""Edge-axis (pair-tensor) sharding over a 2-D ('data', 'edge') mesh.

The O(N^2) pair tensors of very large molecules are sharded over the `edge`
mesh axis (parallel/pairshard.py) — a TPU-native sequence-parallel analogue
with no reference equivalent.  These tests verify on the faked 8-device CPU
mesh that the sharded forward/sampler computes the same function as the
unsharded one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.model import FlowMol
from flowmol_tpu.parallel import mesh as pmesh
from flowmol_tpu.parallel.pairshard import constrain_pairs, pair_sharding
from tests.helpers import tiny_config

# compile-heavy mesh jits: excluded from the fast gate (pyproject tiers)
pytestmark = [pytest.mark.heavy,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 (faked) devices")]


def _forward_inputs(cfg, B=2, N=16, seed=0):
    rng = np.random.default_rng(seed)
    km = 1 if cfg.is_ctmc else 0
    x = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    a = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, cfg.n_atom_types, (B, N))),
        cfg.n_atom_types + km)
    c = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, cfg.n_atom_charges, (B, N))),
        cfg.n_atom_charges + km)
    e = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, cfg.n_bond_types, (B, N, N))),
        cfg.n_bond_types + km)
    t = jnp.linspace(0.2, 0.8, B)
    node_mask = jnp.asarray(
        np.arange(N)[None, :] < np.asarray([N, N - 3])[:, None])
    return x, a, c, e, t, node_mask


@pytest.mark.parametrize("parameterization,mesh_shape", [
    ("ctmc", (2, 4)),      # batch 2-way x pair rows 4-way
    ("ctmc", (1, 8)),      # one giant-molecule group: pure edge sharding
    ("endpoint", (2, 4)),  # the flax PairGVP message path
])
def test_edge_sharded_forward_matches_unsharded(parameterization, mesh_shape):
    cfg = tiny_config(parameterization=parameterization)
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = _forward_inputs(cfg)

    def fwd(params, x, a, c, e, t, node_mask):
        return model.net.apply(params, x, a, c, e, t, node_mask,
                               apply_softmax=True, remove_com=True)

    ref = jax.jit(fwd)(params, *inputs)

    mesh = pmesh.make_mesh_2d(*mesh_shape)
    fn2d = pmesh.jit_forward_2d(fwd, mesh, n_batch_args=len(inputs))
    out = fn2d(params, *inputs)

    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(out[k]),
                                    atol=2e-5,
                                    err_msg=f"output '{k}' diverged")


def test_edge_sharded_sampler_runs_and_is_valid():
    """Full 2-D-mesh CTMC sampler: executes, respects the node mask, and
    leaves no mask tokens behind."""
    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = pmesh.make_mesh_2d(2, 4)
    fn = pmesh.jit_sample_fn_2d(model.make_sample_fn(n_timesteps=6), mesh)
    node_mask = jnp.asarray(np.arange(16)[None, :]
                            < np.array([16, 13, 16, 11])[:, None])
    final = fn(params, jax.random.PRNGKey(1), node_mask)
    x = np.asarray(final["x"])
    assert x.shape == (4, 16, 3) and np.isfinite(x).all()
    # CTMC states are integer tokens; real atoms must hold real classes
    # (mask token = index cfg.mask_idxs['a']) after the final unmask step
    a = np.asarray(final["a"])
    real = a[np.asarray(node_mask)]
    assert real.shape == (np.asarray(node_mask).sum(),)
    assert (real >= 0).all() and (real < cfg.mask_idxs["a"]).all()


def test_constrain_pairs_is_identity_outside_context():
    t = jnp.ones((2, 4, 4, 3))
    assert constrain_pairs(t) is t
    assert constrain_pairs(None) is None


def test_pair_sharding_context_restores_on_exit():
    mesh = pmesh.make_mesh_2d(2, 4)
    sh = pmesh.pair_sharding_2d(mesh)
    t = jnp.ones((2, 8, 8))
    with pair_sharding(sh):
        out = constrain_pairs(t)
        assert out is not t
    assert constrain_pairs(t) is t
