"""Tests for the data pipeline: synthetic generation, packing, batching,
prior coupling."""

import numpy as np
import pytest

from flowmol_tpu.data.dataset import (BucketBatcher, DataConfig,
                                      MoleculeDataModule, PackedDataset,
                                      pad_batch, prepare_molecule)
from flowmol_tpu.data.priors import align_prior_np, np_rigid_align
from flowmol_tpu.data.synthetic import generate_dataset

CTMC_PRIOR = {
    "x": {"align": True, "type": "centered-normal", "kwargs": {"std": 1.0}},
    "a": {"align": False, "type": "ctmc", "kwargs": {}},
    "c": {"align": False, "type": "ctmc", "kwargs": {}},
    "e": {"align": False, "type": "ctmc", "kwargs": {}},
}


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    generate_dataset(out, n_molecules=120, seed=0)
    return out


def test_generate_and_load(synth_dir):
    ds = PackedDataset(synth_dir / "train_data_processed.npz")
    assert len(ds) == 108
    mol = ds.get_molecule(0)
    n = mol["x"].shape[0]
    assert mol["adj"].shape == (n, n)
    assert (mol["adj"] == mol["adj"].T).all()
    assert mol["adj"].diagonal().sum() == 0
    # zero CoM
    np.testing.assert_allclose(mol["x"].mean(0), 0.0, atol=1e-4)


def test_generated_molecules_fully_saturated():
    """Every generated atom must be exactly saturated (valence == element
    max, neutral) so the data passes the MiDi stability tables the analyzer
    falls back to — under-saturated heavy atoms made even the training data
    score ~0.3 frac_valid."""
    from flowmol_tpu.data.synthetic import _DEFAULT_VALENCES, generate_molecule

    rng = np.random.default_rng(3)
    amap = ["C", "H", "N", "O", "F"]
    for _ in range(100):
        n = int(rng.integers(6, 30))
        x, a, c, bonds, bts = generate_molecule(rng, n, 5)
        assert len(a) == n
        val = np.zeros(n)
        for (i, j), t in zip(bonds, bts):
            val[i] += t
            val[j] += t
        expect = np.array([_DEFAULT_VALENCES[amap[t]] for t in a])
        np.testing.assert_array_equal(val, expect)
        assert (c == 0).all()


def test_generated_dataset_emits_valency_tables(synth_dir):
    import json

    with open(synth_dir / "train_data_valencies_kekulized.json") as f:
        table = json.load(f)
    assert table["C"]["0"] == [4]
    assert table["H"]["0"] == [1]


def test_rigid_align_recovers_rotation():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((10, 3)).astype(np.float32)
    # random rotation
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    y = x @ q.T + np.array([1.0, -2.0, 3.0])
    aligned = np_rigid_align(x, y)
    np.testing.assert_allclose(aligned, y, atol=1e-4)


def test_align_prior_reduces_cost():
    rng = np.random.default_rng(1)
    dst = rng.standard_normal((12, 3)).astype(np.float32)
    prior = rng.standard_normal((12, 3)).astype(np.float32)
    d_before = np.linalg.norm(prior - dst)
    aligned = align_prior_np(prior.copy(), dst, permutation=True,
                             rigid_body=True)
    d_after = np.linalg.norm(aligned - dst)
    assert d_after < d_before
    # permutation preserves the multiset of points up to rotation: norm sums
    assert np.allclose(np.sort(np.linalg.norm(prior - prior.mean(0), axis=1)),
                       np.sort(np.linalg.norm(aligned - aligned.mean(0), axis=1)),
                       atol=1e-3)


def test_prepare_molecule_ctmc(synth_dir):
    ds = PackedDataset(synth_dir / "train_data_processed.npz")
    cfg = DataConfig(prior_config=CTMC_PRIOR, n_atom_types=5, is_ctmc=True)
    rng = np.random.default_rng(2)
    prep = prepare_molecule(rng, ds.get_molecule(3), cfg)
    n = prep["x1"].shape[0]
    assert prep["a0"].shape == (n, 6)  # 5 real + mask
    assert (prep["a0"][:, -1] == 1).all()
    assert prep["e0"].shape == (n, n, 5)
    np.testing.assert_allclose(prep["x1"].mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(prep["x0"].mean(0), 0.0, atol=1e-4)


def test_prepare_molecule_fake_atoms(synth_dir):
    ds = PackedDataset(synth_dir / "train_data_processed.npz")
    cfg = DataConfig(prior_config=CTMC_PRIOR, n_atom_types=6, fake_atom_p=0.5,
                     is_ctmc=True)
    rng = np.random.default_rng(3)
    sizes = set()
    for _ in range(10):
        prep = prepare_molecule(rng, ds.get_molecule(3), cfg)
        sizes.add(prep["x1"].shape[0])
        if prep["x1"].shape[0] > ds.get_molecule(3)["x"].shape[0]:
            # fake atoms got token 5 (= n_atom_types - 1)
            assert prep["a1"].max() == 5
    assert len(sizes) > 1  # count is random


def test_bucket_batcher_shapes():
    n_atoms = np.random.default_rng(0).integers(5, 60, 300)
    b = BucketBatcher(n_atoms, max_num_edges=5000,
                      buckets=(16, 32, 64), seed=1)
    seen = set()
    total = 0
    for n_pad, idxs in b:
        assert n_pad in (16, 32, 64)
        assert len(idxs) == b.batch_size_for[n_pad]
        assert (n_atoms[idxs] <= n_pad).all()
        seen.add((n_pad, len(idxs)))
        total += len(idxs)
    assert total >= 300  # stragglers padded by resampling
    assert len(seen) <= 3  # one shape per bucket


def test_bucket_batcher_rank_sharding():
    n_atoms = np.full(100, 10)
    b0 = BucketBatcher(n_atoms, rank=0, world_size=4, buckets=(16,))
    b1 = BucketBatcher(n_atoms, rank=1, world_size=4, buckets=(16,))
    assert len(b0.indices) == 25
    assert set(b0.indices).isdisjoint(b1.indices)


def test_data_module_iterates(synth_dir):
    cfg = DataConfig(prior_config=CTMC_PRIOR, n_atom_types=5, is_ctmc=True)
    dm = MoleculeDataModule(synth_dir, cfg, max_num_edges=3000,
                            buckets=(16, 32, 64))
    rng = np.random.default_rng(0)
    batches = list(dm.iter_split("val", rng))
    assert batches
    for tb in batches:
        B, N = tb.node_mask.shape
        assert tb.x1.shape == (B, N, 3)
        assert tb.e1.shape == (B, N, N)
        assert tb.e0.shape[-1] == 5  # 4 bond types + mask
        # padded entries are zero
        assert (np.asarray(tb.x1)[~np.asarray(tb.node_mask)] == 0).all()


def test_device_priors_prepare_and_pad(synth_dir):
    """DataConfig.device_priors: host prep emits no a0/c0/e0 (sampled on
    device in loss_fn instead), pad_batch yields None for them, and tokens
    are int8 slabs (minimal transfer)."""
    ds = PackedDataset(synth_dir / "train_data_processed.npz")
    cfg = DataConfig(prior_config=CTMC_PRIOR, n_atom_types=5, is_ctmc=True,
                     device_priors=True)
    rng = np.random.default_rng(0)
    mol = prepare_molecule(rng, ds.get_molecule(0), cfg)
    assert "a0" not in mol and "e0" not in mol and "x0" in mol

    tb = pad_batch([mol], 32)
    assert tb.a0 is None and tb.c0 is None and tb.e0 is None
    assert tb.e1.dtype == np.int8 and tb.a1.dtype == np.int8
    assert tb.x0.shape == (1, 32, 3)


def test_data_module_factory_sets_device_priors():
    """api.data_module_from_config turns device_priors on unless a
    categorical prior explicitly requests OT alignment."""
    from flowmol_tpu.api import data_module_from_config, read_config_file
    config = read_config_file("configs/dev.yml")
    dm = data_module_from_config(config)
    assert dm.cfg.device_priors

    config["mol_fm"]["prior_config"]["a"] = {
        "align": True, "type": "uniform-simplex", "kwargs": {}}
    dm = data_module_from_config(config)
    assert not dm.cfg.device_priors
