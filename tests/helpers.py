"""Shared test fixtures: tiny configs and synthetic molecule batches."""

import jax
import jax.numpy as jnp
import numpy as np

from flowmol_tpu.fm.interpolant import InterpolantSchedule
from flowmol_tpu.model import FlowMol, FlowMolConfig, SamplingConfig, TrainBatch
from flowmol_tpu.nn.vector_field import VectorFieldConfig

ATOM_MAP = ("C", "H", "N", "O", "F")


def tiny_config(parameterization="ctmc", self_conditioning=False,
                fake_atom_p=0.0, **vf_overrides) -> FlowMolConfig:
    vf = VectorFieldConfig(
        n_atom_types=len(ATOM_MAP) + (1 if fake_atom_p > 0 else 0),
        n_charges=6,
        n_bond_types=4,
        has_mask=(parameterization == "ctmc"),
        n_vec_channels=4,
        n_hidden_scalars=16,
        n_hidden_edge_feats=16,
        n_recycles=1,
        n_molecule_updates=2,
        convs_per_update=1,
        n_message_gvps=1,
        n_update_gvps=1,
        separate_mol_updaters=True,
        message_norm="sum",
        update_edge_w_distance=True,
        rbf_dmax=10.0,
        rbf_dim=8,
        time_embedding_dim=8,
        a_token_dim=8 if parameterization == "ctmc" else 0,
        c_token_dim=8 if parameterization == "ctmc" else 0,
        e_token_dim=8 if parameterization == "ctmc" else 0,
        self_conditioning=self_conditioning,
        remat=False,
        compute_dtype=vf_overrides.pop("compute_dtype", "float32"),
        **vf_overrides,
    )
    return FlowMolConfig(
        atom_type_map=ATOM_MAP,
        parameterization=parameterization,
        fake_atom_p=fake_atom_p,
        distort_p=0.1,
        schedule=InterpolantSchedule(("linear",) * 4),
        vf=vf,
        sampling=SamplingConfig(stochasticity=5.0,
                                high_confidence_threshold=0.9),
    )


def random_batch(rng_seed=0, B=2, N=8, cfg: FlowMolConfig = None) -> TrainBatch:
    cfg = cfg or tiny_config()
    rng = np.random.default_rng(rng_seed)
    ka, kc, ke = cfg.n_atom_types, cfg.n_atom_charges, cfg.n_bond_types
    km = 1 if cfg.is_ctmc else 0

    n_atoms = rng.integers(4, N + 1, size=B)
    node_mask = np.arange(N)[None, :] < n_atoms[:, None]

    x1 = rng.standard_normal((B, N, 3)).astype(np.float32) * node_mask[..., None]
    x1 = x1 - (x1.sum(1, keepdims=True) /
               np.maximum(node_mask.sum(1)[:, None, None], 1))
    x1 = x1 * node_mask[..., None]
    a1 = rng.integers(0, ka, (B, N)).astype(np.int32)
    c1 = rng.integers(0, kc, (B, N)).astype(np.int32)
    e_up = rng.integers(0, ke, (B, N, N)).astype(np.int32)
    e1 = np.triu(e_up, 1)
    e1 = e1 + e1.swapaxes(1, 2)

    x0 = rng.standard_normal((B, N, 3)).astype(np.float32) * node_mask[..., None]
    if cfg.is_ctmc or cfg.cat_prior_masked:
        a0 = np.zeros((B, N, ka + 1), np.float32)
        a0[..., -1] = 1
        c0 = np.zeros((B, N, kc + 1), np.float32)
        c0[..., -1] = 1
        e0 = np.zeros((B, N, N, ke + 1), np.float32)
        e0[..., -1] = 1
    else:
        a0 = rng.dirichlet(np.ones(ka), (B, N)).astype(np.float32)
        c0 = rng.dirichlet(np.ones(kc), (B, N)).astype(np.float32)
        e0u = rng.dirichlet(np.ones(ke), (B, N, N)).astype(np.float32)
        iu = np.triu_indices(N, 1)
        e0 = np.zeros_like(e0u)
        e0[:, iu[0], iu[1]] = e0u[:, iu[0], iu[1]]
        e0[:, iu[1], iu[0]] = e0u[:, iu[0], iu[1]]

    return TrainBatch(
        x1=jnp.asarray(x1), a1=jnp.asarray(a1), c1=jnp.asarray(c1),
        e1=jnp.asarray(e1), x0=jnp.asarray(x0), a0=jnp.asarray(a0),
        c0=jnp.asarray(c0), e0=jnp.asarray(e0),
        node_mask=jnp.asarray(node_mask))
