"""Public API tests: bucketed sampling and trajectory frame extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.analysis.molecule_builder import trajectory_xyz_frames
from flowmol_tpu.api import bucketed_sample
from flowmol_tpu.model import FlowMol
from tests.helpers import tiny_config


def test_bucketed_sample_groups_and_counts():
    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    sizes = np.array([5, 7, 12, 14, 30, 31])
    results = bucketed_sample(model, params, sizes, seed=0, n_timesteps=4,
                              buckets=(8, 16, 32), max_batch_size=128)
    pads = sorted(nm.shape[1] for _, nm, _ in results)
    assert pads == [8, 16, 32]
    total = sum(nm.shape[0] for _, nm, _ in results)
    assert total == len(sizes)
    for final, nm, traj in results:
        assert traj is None
        assert final["x"].shape[:2] == nm.shape


def test_bucketed_sample_respects_max_batch_size():
    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    sizes = np.full(7, 6)
    results = bucketed_sample(model, params, sizes, seed=0, n_timesteps=3,
                              buckets=(8,), max_batch_size=3)
    assert [nm.shape[0] for _, nm, _ in results] == [3, 3, 1]


def test_trajectory_frames():
    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    sizes = np.array([6, 5])
    results = bucketed_sample(model, params, sizes, seed=0, n_timesteps=5,
                              buckets=(8,), visualize=True)
    final, nm, traj = results[0]
    assert traj is not None
    frames = trajectory_xyz_frames(traj, 0, nm, cfg.atom_type_map,
                                   ctmc_mol=True)
    assert len(frames) == 4  # n_timesteps - 1 scan steps
    first = frames[0].splitlines()
    assert first[0] == "6"           # atom count of molecule 0
    assert len(first) == 2 + 6       # header + atoms
    # endpoint trajectory too
    ep = trajectory_xyz_frames(traj, 1, nm, cfg.atom_type_map, endpoint=True,
                               ctmc_mol=True)
    assert ep[0].splitlines()[0] == "5"


def test_trajectory_frames_continuous():
    """Non-CTMC trajectories carry simplex states; frames must still render
    (regression: argmax for ndim==3 token arrays) and endpoint frames raise
    a clear error."""
    import dataclasses

    cfg = tiny_config(parameterization="endpoint")
    cfg = dataclasses.replace(cfg, prior_config={
        "x": {"align": True, "type": "centered-normal", "kwargs": {"std": 1.0}},
        "a": {"align": False, "type": "uniform-simplex", "kwargs": {}},
        "c": {"align": False, "type": "barycenter", "kwargs": {}},
        "e": {"align": False, "type": "uniform-simplex", "kwargs": {}},
    })
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    results = bucketed_sample(model, params, np.array([6, 5]), seed=0,
                              n_timesteps=5, buckets=(8,), visualize=True)
    final, nm, traj = results[0]
    frames = trajectory_xyz_frames(traj, 0, nm, cfg.atom_type_map,
                                   ctmc_mol=False)
    assert len(frames) == 4 and frames[0].splitlines()[0] == "6"
    # endpoint parameterization records {feat}_pred frames (parity:
    # vector_field.py:556-559) — --ep_traj must work on endpoint models
    ep = trajectory_xyz_frames(traj, 0, nm, cfg.atom_type_map, endpoint=True,
                               ctmc_mol=False)
    assert len(ep) == 4 and ep[0].splitlines()[0] == "6"


def test_trajectory_endpoint_frames_vf_raises():
    """The vector-field parameterization has no endpoint estimate; asking for
    endpoint trajectory frames raises a clear KeyError
    (vector_field.py:463-466)."""
    import dataclasses

    cfg = tiny_config(parameterization="vector-field")
    cfg = dataclasses.replace(cfg, prior_config={
        "x": {"align": True, "type": "centered-normal", "kwargs": {"std": 1.0}},
        "a": {"align": False, "type": "uniform-simplex", "kwargs": {}},
        "c": {"align": False, "type": "uniform-simplex", "kwargs": {}},
        "e": {"align": False, "type": "uniform-simplex", "kwargs": {}},
    })
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    results = bucketed_sample(model, params, np.array([6]), seed=0,
                              n_timesteps=4, buckets=(8,), visualize=True)
    final, nm, traj = results[0]
    assert trajectory_xyz_frames(traj, 0, nm, cfg.atom_type_map,
                                 ctmc_mol=False)
    with pytest.raises(KeyError):
        trajectory_xyz_frames(traj, 0, nm, cfg.atom_type_map, endpoint=True,
                              ctmc_mol=False)


def test_dirichlet_trajectory_endpoint_frames():
    import dataclasses

    cfg = tiny_config(parameterization="dirichlet")
    cfg = dataclasses.replace(cfg, prior_config={
        "x": {"align": True, "type": "centered-normal", "kwargs": {"std": 1.0}},
        "a": {"align": False, "type": "uniform-simplex", "kwargs": {}},
        "c": {"align": False, "type": "uniform-simplex", "kwargs": {}},
        "e": {"align": False, "type": "uniform-simplex", "kwargs": {}},
    })
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    results = bucketed_sample(model, params, np.array([5]), seed=0,
                              n_timesteps=4, buckets=(8,), visualize=True)
    final, nm, traj = results[0]
    ep = trajectory_xyz_frames(traj, 0, nm, cfg.atom_type_map, endpoint=True,
                               ctmc_mol=False)
    assert len(ep) == 3 and ep[0].splitlines()[0] == "5"


def test_pretrained_sample_in_input_order():
    """PretrainedModel.sample(n_atoms) returns molecules in the caller's
    order (parity: FlowMol.sample, flowmol.py:490-560) even though dispatch
    groups sizes into padded buckets."""
    from flowmol_tpu.api import PretrainedModel

    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pm = PretrainedModel(model, params, config={}, n_atoms_dist=None)
    sizes = [30, 5, 12, 7, 31, 14]  # deliberately bucket-interleaved
    mols = pm.sample(sizes, n_timesteps=4, buckets=(8, 16, 32))
    assert [m.num_atoms for m in mols] == sizes


def test_flowmol_compat_alias():
    """`import flowmol` (the reference package name) resolves to this
    framework so reference-user code runs unchanged."""
    import flowmol
    import flowmol_tpu
    assert flowmol.load_pretrained is flowmol_tpu.load_pretrained
    assert flowmol.MolBatch is flowmol_tpu.MolBatch


def test_trajectory_sdf_bonded():
    """Bonded SDF trajectories (reference parity: per-step molecules with
    bonds, molecule_builder.py:156-214 + test.py:224-259): every scan frame
    renders as a V2000 mol block whose bond block comes from that frame's
    edge tokens; charges appear as M CHG lines."""
    from flowmol_tpu.analysis.molecule_builder import trajectory_sdf

    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    results = bucketed_sample(model, params, np.array([6, 5]), seed=0,
                              n_timesteps=5, buckets=(8,), visualize=True)
    final, nm, traj = results[0]
    sdf = trajectory_sdf(traj, 0, nm, cfg.atom_type_map, ctmc_mol=True)
    records = [r for r in sdf.split("$$$$") if r.strip()]
    assert len(records) == 4  # n_timesteps - 1 scan steps
    for rec in records:
        lines = rec.strip().splitlines()
        counts = lines[3]
        assert counts.endswith("V2000")
        n_at, n_bd = int(counts[:3]), int(counts[3:6])
        assert n_at == 6
        atom_lines = lines[4:4 + n_at]
        assert all(len(l.split()) >= 4 for l in atom_lines)
        bond_lines = lines[4 + n_at:4 + n_at + n_bd]
        for bl in bond_lines:
            i, j, b = int(bl[:3]), int(bl[3:6]), int(bl[6:9])
            assert 1 <= i <= n_at and 1 <= j <= n_at and 1 <= b <= 4
        assert lines[-1] == "M  END"
    # endpoint-predicted trajectory renders too
    sdf_ep = trajectory_sdf(traj, 1, nm, cfg.atom_type_map, endpoint=True,
                            ctmc_mol=True)
    assert sdf_ep.count("$$$$") == 4
    first_counts = sdf_ep.splitlines()[3]
    assert int(first_counts[:3]) == 5


def test_trajectory_sdf_continuous_dense_edges():
    """Continuous parameterizations record dense simplex edge frames ('e',
    not 'e_up'); the SDF writer extracts upper-triangle bonds from them."""
    import dataclasses

    from flowmol_tpu.analysis.molecule_builder import trajectory_sdf

    cfg = tiny_config(parameterization="endpoint")
    cfg = dataclasses.replace(cfg, prior_config={
        "x": {"align": True, "type": "centered-normal", "kwargs": {"std": 1.0}},
        "a": {"align": False, "type": "uniform-simplex", "kwargs": {}},
        "c": {"align": False, "type": "barycenter", "kwargs": {}},
        "e": {"align": False, "type": "uniform-simplex", "kwargs": {}},
    })
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    results = bucketed_sample(model, params, np.array([6]), seed=0,
                              n_timesteps=4, buckets=(8,), visualize=True)
    final, nm, traj = results[0]
    assert "e_up" not in traj and "e" in traj
    sdf = trajectory_sdf(traj, 0, nm, cfg.atom_type_map, ctmc_mol=False)
    assert sdf.count("$$$$") == 3
    assert sdf.splitlines()[3].endswith("V2000")
