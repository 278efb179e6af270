"""Featurizer + process_qm9 pipeline exercised end to end against the
fake-RDKit fixture (tests/fake_rdkit.py).

The real RDKit is absent in this image; these tests pin the pure logic the
chemistry dependency wraps: the failure-mode taxonomy, bond-order adjacency
extraction, valency-tuple accumulation, packed-slab outputs and the QM9
split/skip-list flow (parity: reference flowmol/data_processing/geom.py:132-246,
process_qm9.py:51-84,255-272).
"""

import json
import pickle
import sys

import numpy as np
import pytest

from . import fake_rdkit
from .fake_rdkit import FakeMol


@pytest.fixture()
def rdkit_fixture():
    fake_rdkit.install()
    yield fake_rdkit
    fake_rdkit.uninstall()


ATOM_MAP = ["C", "H", "O"]
AMAP = {s: i for i, s in enumerate(ATOM_MAP)}


def water(**kw):
    # O-H, O-H single bonds
    adj = np.zeros((3, 3))
    adj[0, 1] = adj[1, 0] = 1
    adj[0, 2] = adj[2, 0] = 1
    pos = np.array([[0.0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    return FakeMol(["O", "H", "H"], pos, adj, smiles="O", **kw)


def ethene():
    # H2C=CH2: C=C double, four C-H singles
    adj = np.zeros((6, 6))
    adj[0, 1] = adj[1, 0] = 2
    for h, c in ((2, 0), (3, 0), (4, 1), (5, 1)):
        adj[h, c] = adj[c, h] = 1
    pos = np.random.default_rng(0).standard_normal((6, 3))
    return FakeMol(["C", "C", "H", "H", "H", "H"], pos, adj, smiles="C=C")


def benzene_aromatic():
    # 6-ring of aromatic (1.5) bonds, no hydrogens
    adj = np.zeros((6, 6))
    for i in range(6):
        j = (i + 1) % 6
        adj[i, j] = adj[j, i] = 1.5
    kek = np.zeros((6, 6))
    for i in range(6):
        j = (i + 1) % 6
        kek[i, j] = kek[j, i] = 1 + (i % 2)
    t = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    pos = np.stack([np.cos(t), np.sin(t), np.zeros(6)], 1) * 1.39
    return FakeMol(["C"] * 6, pos, adj, kekulized_adj=kek, smiles="c1ccccc1")


# --------------------------------------------------------------- featurize

def test_failure_taxonomy(rdkit_fixture):
    from flowmol_tpu.data.featurizer import (batch_molecule_data,
                                             featurize_molecule)

    frag_adj = np.zeros((4, 4))
    frag_adj[0, 1] = frag_adj[1, 0] = 1
    frag_adj[2, 3] = frag_adj[3, 2] = 1
    cases = [
        (water(bad_sanitize=True), "sanitization"),
        (water(bad_kekulize=True), "kekulization"),
        (FakeMol(["C", "H", "C", "H"], np.zeros((4, 3)), frag_adj),
         "fragmentation"),
        (FakeMol(["Xx", "H"], np.zeros((2, 3)),
                 np.array([[0, 1.0], [1, 0]])), "atom_map"),
    ]
    results = [featurize_molecule(m, AMAP) for m, _ in cases]
    for r, (_, mode) in zip(results, cases):
        assert r.failed and r.failure_mode == mode
    batch = batch_molecule_data(results + [featurize_molecule(water(), AMAP)])
    assert batch.failure_counts == {"sanitization": 1, "kekulization": 1,
                                    "fragmentation": 1, "atom_map": 1}
    assert len(batch.molecules) == 1


def test_featurize_success_kekulized(rdkit_fixture):
    from flowmol_tpu.data.featurizer import featurize_molecule

    r = featurize_molecule(ethene(), AMAP)
    assert not r.failed
    np.testing.assert_array_equal(r.atom_types, [0, 0, 1, 1, 1, 1])
    np.testing.assert_array_equal(r.atom_charges, np.zeros(6))
    # bonds are upper-triangle (i < j), types in {1,2,3}
    assert (r.bond_idxs[:, 0] < r.bond_idxs[:, 1]).all()
    assert r.bond_types.tolist().count(2) == 1  # one double bond
    assert r.bond_types.tolist().count(1) == 4  # four C-H bonds
    # no-bond count fills slot 0: C(6,2)=15 pairs, 5 bonded
    assert r.bond_order_counts[0] == 10
    assert r.bond_order_counts[1] == 4 and r.bond_order_counts[2] == 1
    # valency tuples: C charge 0 valency 4, H charge 0 valency 1
    assert {tuple(v) for v in r.unique_valencies} == {(0, 0, 4), (1, 0, 1)}


def test_featurize_aromatic_mode(rdkit_fixture):
    from flowmol_tpu.data.featurizer import (build_valency_table,
                                             featurize_molecule)

    r = featurize_molecule(benzene_aromatic(), AMAP,
                           explicit_aromaticity=True)
    assert not r.failed
    # aromatic bonds map to token 4; 6 of them
    assert (r.bond_types == 4).sum() == 6
    # 4-tuple valencies: each C has 2 aromatic neighbors, 0 non-aromatic
    assert {tuple(v) for v in r.unique_valencies} == {(0, 0, 2, 0)}
    table = build_valency_table(r.unique_valencies, ATOM_MAP,
                                explicit_aromaticity=True)
    assert table == {"C": {"0": [[2, 0]]}}


def test_featurize_kekulize_path_rewrites_aromatic(rdkit_fixture):
    from flowmol_tpu.data.featurizer import featurize_molecule

    r = featurize_molecule(benzene_aromatic(), AMAP,
                           explicit_aromaticity=False)
    assert not r.failed
    # kekulized: alternating single/double, no aromatic token
    assert set(r.bond_types.tolist()) == {1, 2}
    assert {tuple(v) for v in r.unique_valencies} == {(0, 0, 3)}


def test_remove_hs(rdkit_fixture):
    from flowmol_tpu.data.featurizer import MoleculeFeaturizer

    feat = MoleculeFeaturizer(["C", "O"])  # no H -> implicit-H mode
    assert not feat.explicit_hydrogens
    batch = feat.featurize_molecules([ethene()])
    (r,) = batch.molecules
    assert r.positions.shape[0] == 2  # hydrogens stripped
    np.testing.assert_array_equal(r.atom_types, [0, 0])
    assert r.bond_types.tolist() == [2]


# ------------------------------------------------------------ process_qm9

def _fake_qm9_raw(tmp_path, n_mols=12, skip_idx=(3,)):
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(1)
    mols = []
    for i in range(n_mols):
        m = water() if i % 2 else ethene()
        m.positions = m.positions + rng.standard_normal(3)
        m.smiles = f"mol{i}"
        mols.append(m)
    mols[5] = None  # supplier parse failure -> skipped
    fake_rdkit.set_sdf_molecules(mols)
    (raw / "gdb9.sdf").write_text("(ignored by fake supplier)")
    import pandas as pd
    pd.DataFrame({"mol_id": [f"gdb_{i}" for i in range(n_mols)],
                  "A": np.arange(n_mols)}).to_csv(raw / "gdb9.sdf.csv",
                                                  index=False)
    lines = [f"header {i}" for i in range(9)]
    lines += [f"{i + 1}  gdb_{i}" for i in skip_idx]  # 1-based ids
    lines += ["trailer", ""]
    (raw / "uncharacterized.txt").write_text("\n".join(lines))
    return raw, mols


def test_read_skip_ids(rdkit_fixture, tmp_path):
    sys.path.insert(0, "/root/repo")
    import process_qm9

    raw, _ = _fake_qm9_raw(tmp_path, skip_idx=(3, 7))
    assert process_qm9.read_skip_ids(raw) == {3, 7}


def test_process_qm9_end_to_end(rdkit_fixture, tmp_path, monkeypatch):
    import yaml

    sys.path.insert(0, "/root/repo")
    import process_qm9

    raw, mols = _fake_qm9_raw(tmp_path)
    out = tmp_path / "processed"
    cfg = {"dataset": {"raw_data_dir": str(raw),
                       "processed_data_dir": str(out),
                       "atom_map": ATOM_MAP, "dataset_name": "qm9"},
           "mol_fm": {"explicit_aromaticity": False}}
    cfg_path = tmp_path / "qm9.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.setattr(sys, "argv", ["process_qm9.py", "--config",
                                      str(cfg_path)])
    process_qm9.main()

    from flowmol_tpu.data.dataset import PackedDataset
    from flowmol_tpu.data.stats import NAtomsDistribution

    total = 0
    for split in ("train_data", "val_data", "test_data"):
        p = out / f"{split}_processed.npz"
        assert p.exists(), split
        ds = PackedDataset(p)
        total += len(ds)
        if len(ds):
            mol = ds.get_molecule(0)
            assert mol["x"].shape[0] in (3, 6)
            assert (mol["adj"] == mol["adj"].T).all()
            hist = NAtomsDistribution.load(
                out / f"{split}_n_atoms_histogram.npz")
            szs = hist.sample(np.random.default_rng(0), 8)
            assert ((szs == 3) | (szs == 6)).all()
        if len(ds):
            with open(out / f"{split}_smiles.pkl", "rb") as f:
                smiles = pickle.load(f)
            assert len(smiles) >= len(ds)
            assert json.loads(
                (out / f"{split}_valencies_kekulized.json").read_text()
            ) is not None
    # 12 mols - 1 None - 1 skip-listed = 10 land across the splits
    assert total == 10


# ------------------------------------------------- from_rdkit_mol round-trip

def test_from_rdkit_mol_roundtrip(rdkit_fixture):
    """from_rdkit_mol (the baselines-flow reverse constructor) must agree
    with the featurizer on the same molecule (parity:
    reference molecule_builder.py:86-128)."""
    import importlib

    import flowmol_tpu.analysis.molecule_builder as mb
    mb = importlib.reload(mb)  # re-evaluate the gated RDKit import
    try:
        from flowmol_tpu.data.featurizer import featurize_molecule

        mol = ethene()
        sm = mb.SampledMolecule.from_rdkit_mol(mol, atom_type_map=ATOM_MAP)
        feat = featurize_molecule(mol, AMAP)

        np.testing.assert_array_equal(sm.atom_tokens, feat.atom_types)
        np.testing.assert_array_equal(sm.atom_charges, feat.atom_charges)
        np.testing.assert_allclose(sm.positions, feat.positions, atol=1e-6)
        # dense symmetric bonds match the featurizer's upper-tri list
        for (i, j), bt in zip(feat.bond_idxs, feat.bond_types):
            assert sm.bonds[i, j] == bt and sm.bonds[j, i] == bt
        assert (np.diag(sm.bonds) == 0).all()
        assert sm.bonds.sum() == 2 * feat.bond_types.sum()

        # aromatic molecule: 1.5 -> token 4, explicit_aromaticity inferred
        arom = mb.SampledMolecule.from_rdkit_mol(benzene_aromatic(),
                                                 atom_type_map=ATOM_MAP)
        assert arom.explicit_aromaticity
        assert (arom.bonds == 4).sum() == 12  # 6 bonds, both triangles
    finally:
        fake_rdkit.uninstall()
        importlib.reload(mb)


# ------------------------------------------------- process_geom end-to-end

def test_process_geom_end_to_end(rdkit_fixture, tmp_path, monkeypatch):
    """Drive process_geom.py whole: MiDi-pickle flattening with the
    confs_per_mol cap (parity: reference process_geom.py:187-199), chunked
    featurization with the failure census, packed slabs, marginals,
    histogram, smiles and valency outputs."""
    import yaml

    sys.path.insert(0, "/root/repo")
    import process_geom

    # MiDi format: list of (smiles, [conformer mols]); bare mols also occur
    bad = water()
    bad.symbols[0] = "N"  # element outside the atom map -> featurizer failure
    raw = [("O", [water(), water()]),   # 2 conformers, capped to 1
           ("C=C", [ethene()]),
           water(),                      # bare-entry path
           ("N", [bad])]
    raw_path = tmp_path / "val_data.pickle"
    with open(raw_path, "wb") as f:
        pickle.dump(raw, f)

    out = tmp_path / "processed_geom"
    cfg = {"dataset": {"processed_data_dir": str(out), "atom_map": ATOM_MAP,
                       "dataset_name": "geom", "confs_per_mol": 1},
           "mol_fm": {"explicit_aromaticity": False}}
    cfg_path = tmp_path / "geom.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.setattr(sys, "argv", [
        "process_geom.py", str(raw_path), "--config", str(cfg_path),
        "--split", "val", "--chunk_size", "2"])
    process_geom.main()

    from flowmol_tpu.data.dataset import PackedDataset
    from flowmol_tpu.data.stats import MarginalDists, NAtomsDistribution

    ds = PackedDataset(out / "val_data_processed.npz")
    assert len(ds) == 3  # capped water + ethene + bare water; bad one failed
    mol = ds.get_molecule(0)
    assert (mol["adj"] == mol["adj"].T).all()

    failures = json.loads((out / "val_failure_counts.json").read_text())
    assert sum(failures.values()) == 1

    hist = NAtomsDistribution.load(out / "val_data_n_atoms_histogram.npz")
    szs = hist.sample(np.random.default_rng(0), 16)
    assert ((szs == 3) | (szs == 6)).all()

    marg = MarginalDists.load(out / "val_data_marginal_dists.npz")
    assert marg.p_a.shape == (len(ATOM_MAP),)
    assert abs(marg.p_a.sum() - 1.0) < 1e-5

    with open(out / "val_data_smiles.pkl", "rb") as f:
        smiles = pickle.load(f)
    assert "O" in smiles and "C=C" in smiles and None in smiles

    table = json.loads(
        (out / "val_data_valencies_kekulized.json").read_text())
    assert table  # non-empty (element, charge) -> valency sets
