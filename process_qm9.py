#!/usr/bin/env python
"""QM9 data-processing pipeline.

Parity target: /root/reference/process_qm9.py — skip-list of uncharacterized
molecules, SDF reading (sanitization deferred to the featurizer),
deterministic 100k/10%/rest split with seed 42, and the same packed outputs
as process_geom.py.

Requires RDKit (gated).  Usage:
    python process_qm9.py --config configs/qm9.yml
Expects <raw_data_dir>/gdb9.sdf, gdb9.sdf.csv, uncharacterized.txt.
"""

import argparse
import json
import pickle
from collections import defaultdict
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=Path, required=True)
    p.add_argument("--n_cpus", type=int, default=1)
    p.add_argument("--chunk_size", type=int, default=2000)
    return p.parse_args()


def read_skip_ids(raw_dir: Path) -> set:
    """The 3054 uncharacterized QM9 molecules (process_qm9.py:51-55)."""
    ids = set()
    f = raw_dir / "uncharacterized.txt"
    if not f.exists():
        return ids
    lines = f.read_text().split("\n")[9:-2]
    for x in lines:
        ids.add(int(x.split()[0]) - 1)
    return ids


def process_split(mols, smiles, split_name, out_dir, atom_map,
                  explicit_aromaticity, n_cpus, chunk_size):
    from flowmol_tpu.data.dataset import save_packed
    from flowmol_tpu.data.featurizer import (MoleculeFeaturizer,
                                             build_valency_table,
                                             pack_molecules)
    from flowmol_tpu.data.stats import NAtomsDistribution, compute_marginals

    feat = MoleculeFeaturizer(atom_map, n_cpus=n_cpus,
                              explicit_aromaticity=explicit_aromaticity)
    ok, failures = [], defaultdict(int)
    n_bond = 5 if explicit_aromaticity else 4
    bond_counts = np.zeros(n_bond, np.int64)
    valencies = []
    for i in range(0, len(mols), chunk_size):
        batch = feat.featurize_molecules(mols[i:i + chunk_size])
        ok.extend(batch.molecules)
        for k, v in batch.failure_counts.items():
            failures[k] += v
        bond_counts += batch.bond_order_counts
        if batch.all_valencies.size:
            valencies.append(batch.all_valencies)

    packed = pack_molecules(ok)
    save_packed(out_dir / f"{split_name}_processed.npz", *packed)
    if not ok:
        # an empty split (e.g. tiny dataset_size smoke runs) still gets a
        # loadable processed file, but no stats artifacts
        print(f"{split_name}: 0 molecules, failures {dict(failures)}")
        return

    a_all = np.concatenate([m.atom_types for m in ok])
    c_all = np.clip(np.concatenate([m.atom_charges for m in ok]) + 2, 0, 5)
    b_all = np.concatenate([m.bond_types for m in ok])
    marg = compute_marginals(a_all, c_all, b_all, len(atom_map),
                             n_bond_types=n_bond,
                             n_no_bond=int(bond_counts[0]))
    marg.save(out_dir / f"{split_name}_marginal_dists.npz")
    sizes = np.array([m.positions.shape[0] for m in ok])
    NAtomsDistribution.from_sizes(sizes).save(
        out_dir / f"{split_name}_n_atoms_histogram.npz")
    with open(out_dir / f"{split_name}_smiles.pkl", "wb") as f:
        pickle.dump(smiles, f)
    with open(out_dir / f"{split_name.replace('_data', '')}_failure_counts.json",
              "w") as f:
        json.dump(dict(failures), f, indent=2)
    suffix = "aromatic" if explicit_aromaticity else "kekulized"
    table = build_valency_table(
        np.unique(np.concatenate(valencies), axis=0) if valencies
        else np.zeros((0, 3), np.int64), atom_map, explicit_aromaticity)
    with open(out_dir / f"{split_name}_valencies_{suffix}.json", "w") as f:
        json.dump(table, f, indent=2)
    print(f"{split_name}: {len(ok)} molecules, failures {dict(failures)}")


def main():
    args = parse_args()
    try:
        import pandas as pd
        from rdkit import Chem
    except ImportError as e:
        raise SystemExit(f"process_qm9.py requires pandas + rdkit "
                         f"(pip install rdkit pandas): {e}")

    from flowmol_tpu.api import read_config_file

    config = read_config_file(args.config)
    ds_cfg = config["dataset"]
    raw_dir = Path(ds_cfg["raw_data_dir"])
    out_dir = Path(ds_cfg["processed_data_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    atom_map = ds_cfg["atom_map"]
    explicit_aromaticity = bool(
        config.get("mol_fm", {}).get("explicit_aromaticity", False))

    skip = read_skip_ids(raw_dir)

    # deterministic split: shuffle with seed 42, 100k train / 10% test / rest
    # val (process_qm9.py:255-272)
    df = pd.read_csv(raw_dir / "gdb9.sdf.csv")
    n_samples = df.shape[0]
    n_train = 100000
    n_test = int(0.1 * n_samples)
    perm = df.sample(frac=1, random_state=42)
    train = perm.iloc[:n_train]
    val = perm.iloc[n_train:n_samples - n_test]
    test = perm.iloc[n_samples - n_test:]
    split_idx = {"train_data": set(train.index), "val_data": set(val.index),
                 "test_data": set(test.index)}

    reader = Chem.SDMolSupplier(str(raw_dir / "gdb9.sdf"), removeHs=False,
                                sanitize=False)
    split_mols = {k: [] for k in split_idx}
    split_smiles = {k: [] for k in split_idx}
    limit = ds_cfg.get("dataset_size") or np.inf
    for mol_idx, mol in enumerate(reader):
        if mol is None or mol_idx in skip:
            continue
        for split, idxs in split_idx.items():
            if mol_idx in idxs and len(split_mols[split]) < limit:
                split_mols[split].append(mol)
                smi = Chem.MolToSmiles(mol, isomericSmiles=True)
                split_smiles[split].append(smi)
                break

    for split in split_mols:
        process_split(split_mols[split], split_smiles[split], split, out_dir,
                      atom_map, explicit_aromaticity, args.n_cpus,
                      args.chunk_size)


if __name__ == "__main__":
    main()
