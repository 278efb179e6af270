#!/usr/bin/env python
"""GEOM-Drugs data-processing pipeline.

Parity target: /root/reference/process_geom.py — load MiDi-format conformer
pickles, flatten with a confs_per_mol cap, featurize in chunks with a
failure-mode census, pack flat slabs + index arrays, and write per-split:
  <split>_data_processed.npz, <split>_data_marginal_dists.npz,
  <split>_data_n_atoms_histogram.npz, <split>_data_smiles.pkl,
  <split>_failure_counts.json, <split>_data_valencies_*.json

Requires RDKit (gated).  Usage:
    python process_geom.py <split_data.pickle> --config configs/flowmol3.yml
"""

import argparse
import json
import pickle
from collections import defaultdict
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("raw_file", type=Path,
                   help="MiDi-format pickle of (smiles, conformer mols)")
    p.add_argument("--config", type=Path, required=True)
    p.add_argument("--split", default="train", choices=["train", "val", "test"])
    p.add_argument("--n_cpus", type=int, default=1)
    p.add_argument("--chunk_size", type=int, default=2000)
    return p.parse_args()


def flatten_conformers(raw, confs_per_mol=None):
    """MiDi pickles: list of (smiles, [conformer rdkit mols]) — flatten with a
    per-molecule conformer cap (process_geom.py:187-199)."""
    mols, smiles = [], []
    for entry in raw:
        if isinstance(entry, (list, tuple)) and len(entry) == 2:
            smi, confs = entry
        else:
            smi, confs = None, [entry]
        if confs_per_mol is not None:
            confs = confs[:confs_per_mol]
        for c in confs:
            mols.append(c)
            smiles.append(smi)
    return mols, smiles


def main():
    args = parse_args()
    try:
        from rdkit import Chem  # gated: required for data processing
    except ImportError as e:
        raise SystemExit(
            f"process_geom.py requires rdkit (pip install rdkit): {e}")

    from flowmol_tpu.api import read_config_file
    from flowmol_tpu.data.dataset import save_packed
    from flowmol_tpu.data.featurizer import (MoleculeFeaturizer,
                                             build_valency_table,
                                             pack_molecules)
    from flowmol_tpu.data.stats import (MarginalDists, NAtomsDistribution,
                                        compute_marginals)
    config = read_config_file(args.config)
    ds_cfg = config["dataset"]
    atom_map = ds_cfg["atom_map"]
    explicit_aromaticity = bool(
        config.get("mol_fm", {}).get("explicit_aromaticity", False))
    out_dir = Path(ds_cfg["processed_data_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)

    with open(args.raw_file, "rb") as f:
        raw = pickle.load(f)
    mols, smiles = flatten_conformers(raw, ds_cfg.get("confs_per_mol"))
    if ds_cfg.get("dataset_size"):
        mols = mols[: ds_cfg["dataset_size"]]
        smiles = smiles[: ds_cfg["dataset_size"]]
    print(f"{len(mols)} conformers to featurize")

    feat = MoleculeFeaturizer(atom_map, n_cpus=args.n_cpus,
                              explicit_aromaticity=explicit_aromaticity)
    all_mols, failure_counts = [], defaultdict(int)
    n_bond = 5 if explicit_aromaticity else 4
    bond_counts = np.zeros(n_bond, np.int64)
    valencies = []
    for i in range(0, len(mols), args.chunk_size):
        batch = feat.featurize_molecules(mols[i:i + args.chunk_size])
        all_mols.extend(batch.molecules)
        for k, v in batch.failure_counts.items():
            failure_counts[k] += v
        bond_counts += batch.bond_order_counts
        if batch.all_valencies.size:
            valencies.append(batch.all_valencies)
        print(f"  chunk {i // args.chunk_size}: {len(batch.molecules)} ok, "
              f"failures so far {dict(failure_counts)}")

    packed = pack_molecules(all_mols)
    save_packed(out_dir / f"{args.split}_data_processed.npz", *packed)

    a_all = np.concatenate([m.atom_types for m in all_mols])
    c_all = np.clip(np.concatenate([m.atom_charges for m in all_mols]) + 2,
                    0, 5)
    b_all = np.concatenate([m.bond_types for m in all_mols])
    marg = compute_marginals(a_all, c_all, b_all, len(atom_map),
                             n_bond_types=n_bond,
                             n_no_bond=int(bond_counts[0]))
    marg.save(out_dir / f"{args.split}_data_marginal_dists.npz")

    sizes = np.array([m.positions.shape[0] for m in all_mols])
    NAtomsDistribution.from_sizes(sizes).save(
        out_dir / f"{args.split}_data_n_atoms_histogram.npz")

    with open(out_dir / f"{args.split}_data_smiles.pkl", "wb") as f:
        pickle.dump(smiles, f)
    with open(out_dir / f"{args.split}_failure_counts.json", "w") as f:
        json.dump(dict(failure_counts), f, indent=2)

    suffix = "aromatic" if explicit_aromaticity else "kekulized"
    table = build_valency_table(
        np.unique(np.concatenate(valencies), axis=0) if valencies
        else np.zeros((0, 3), np.int64),
        atom_map, explicit_aromaticity)
    with open(out_dir / f"{args.split}_data_valencies_{suffix}.json", "w") as f:
        json.dump(table, f, indent=2)

    print(f"wrote {len(all_mols)} molecules -> {out_dir}")


if __name__ == "__main__":
    main()
