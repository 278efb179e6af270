"""RDKit molecule featurizer (offline data processing).

Parity target: /root/reference/flowmol/data_processing/geom.py
(`MoleculeFeaturizer` 85-128, `featurize_molecule` 132-246): sanitize ->
(kekulize) -> optional H removal -> fragment check -> positions / atom-type
tokens / formal charges / upper-triangle bond list, plus valency-tuple and
bond-order-count accumulation, with the same failure-mode taxonomy
(sanitization / kekulization / fragmentation / atom_map).

Everything here is numpy (no torch); RDKit is a gated import — this module
raises only when actually used without RDKit.  Multiprocessing fan-out is
host CPU work, unchanged in design from the reference.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from multiprocessing import Pool
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class MoleculeData:
    failed: bool = False
    failure_mode: Optional[str] = None
    positions: Optional[np.ndarray] = None        # (n, 3) f32
    atom_types: Optional[np.ndarray] = None       # (n,) int tokens
    atom_charges: Optional[np.ndarray] = None     # (n,) int raw charges
    bond_types: Optional[np.ndarray] = None       # (e,) int in [1..4|5]
    bond_idxs: Optional[np.ndarray] = None        # (e, 2) upper-tri indices
    bond_order_counts: Optional[np.ndarray] = None  # (4|5,) incl no-bond
    unique_valencies: Optional[np.ndarray] = None   # (u, 3|4) tcv tuples


def featurize_molecule(molecule, atom_map_dict: Dict[str, int],
                       explicit_hydrogens: bool = True,
                       explicit_aromaticity: bool = False) -> MoleculeData:
    from rdkit import Chem

    try:
        Chem.SanitizeMol(molecule)
    except Chem.MolSanitizeException:
        return MoleculeData(failed=True, failure_mode="sanitization")

    if not explicit_aromaticity:
        try:
            Chem.Kekulize(molecule, clearAromaticFlags=True)
        except Chem.KekulizeException:
            return MoleculeData(failed=True, failure_mode="kekulization")

    if not explicit_hydrogens:
        molecule = Chem.RemoveHs(molecule)

    if len(Chem.GetMolFrags(molecule, sanitizeFrags=False)) > 1:
        return MoleculeData(failed=True, failure_mode="fragmentation")

    positions = molecule.GetConformer().GetPositions().astype(np.float32)
    n = molecule.GetNumAtoms()
    atom_types = np.zeros(n, np.int64)
    atom_charges = np.zeros(n, np.int64)
    for i, atom in enumerate(molecule.GetAtoms()):
        sym = atom.GetSymbol()
        if sym not in atom_map_dict:
            return MoleculeData(failed=True, failure_mode="atom_map")
        atom_types[i] = atom_map_dict[sym]
        atom_charges[i] = atom.GetFormalCharge()

    adj = Chem.rdmolops.GetAdjacencyMatrix(molecule, useBO=True).astype(
        np.float64)

    # valency tuples (type, charge, valency) or (type, charge, n_arom,
    # non_arom) for the dataset-derived stability tables
    if not explicit_aromaticity:
        valencies = adj.sum(1)
        tcv = np.stack([atom_types, atom_charges,
                        valencies.astype(np.int64)], 1)
    else:
        n_arom = (adj == 1.5).sum(1).astype(np.int64)
        non_arom = (adj.sum(1) - n_arom * 1.5).astype(np.int64)
        tcv = np.stack([atom_types, atom_charges, n_arom, non_arom], 1)
    unique_valencies = np.unique(tcv, axis=0)

    iu, ju = np.nonzero(np.triu(adj))
    bond_types = adj[iu, ju]
    bond_types = np.where(bond_types == 1.5, 4.0, bond_types).astype(np.int64)
    bond_idxs = np.stack([iu, ju], 1).astype(np.int64)

    n_bond_orders = 5 if explicit_aromaticity else 4
    counts = np.bincount(bond_types, minlength=n_bond_orders)[:n_bond_orders]
    counts[0] = n * (n - 1) // 2 - bond_idxs.shape[0]

    return MoleculeData(
        positions=positions, atom_types=atom_types, atom_charges=atom_charges,
        bond_types=bond_types, bond_idxs=bond_idxs,
        bond_order_counts=counts.astype(np.int64),
        unique_valencies=unique_valencies, failed=False)


@dataclasses.dataclass
class BatchMoleculeData:
    """Accumulated featurization results for a chunk of molecules."""

    molecules: List[MoleculeData]
    failure_counts: Dict[str, int]
    bond_order_counts: np.ndarray
    all_valencies: np.ndarray


def batch_molecule_data(results: Sequence[MoleculeData],
                        explicit_aromaticity: bool = False
                        ) -> BatchMoleculeData:
    failure_counts: Dict[str, int] = defaultdict(int)
    ok = []
    n_bond_orders = 5 if explicit_aromaticity else 4
    boc = np.zeros(n_bond_orders, np.int64)
    vals = []
    for r in results:
        if r.failed:
            failure_counts[r.failure_mode] += 1
            continue
        ok.append(r)
        boc += r.bond_order_counts
        vals.append(r.unique_valencies)
    all_vals = (np.unique(np.concatenate(vals), axis=0)
                if vals else np.zeros((0, 3), np.int64))
    return BatchMoleculeData(molecules=ok, failure_counts=dict(failure_counts),
                             bond_order_counts=boc, all_valencies=all_vals)


class MoleculeFeaturizer:
    def __init__(self, atom_map: Sequence[str], n_cpus: int = 1,
                 explicit_aromaticity: bool = False):
        if len(atom_map) != len(set(atom_map)):
            raise ValueError("Atom map must contain unique elements.")
        self.atom_map = list(atom_map)
        self.atom_map_dict = {a: i for i, a in enumerate(atom_map)}
        self.explicit_aromaticity = explicit_aromaticity
        self.explicit_hydrogens = "H" in atom_map
        self.pool = Pool(n_cpus) if n_cpus > 1 else None

    def featurize_molecules(self, molecules) -> BatchMoleculeData:
        import functools
        fn = functools.partial(featurize_molecule,
                               atom_map_dict=self.atom_map_dict,
                               explicit_hydrogens=self.explicit_hydrogens,
                               explicit_aromaticity=self.explicit_aromaticity)
        if self.pool is None:
            results = [fn(m) for m in molecules]
        else:
            results = self.pool.map(fn, molecules)
        return batch_molecule_data(results, self.explicit_aromaticity)


def build_valency_table(all_valencies: np.ndarray, atom_map: Sequence[str],
                        explicit_aromaticity: bool = False) -> Dict:
    """Observed-valency table {symbol: {charge: [valencies...]}} — the format
    of the reference's `*_valencies_*.json` files (process_geom.py:73-110)."""
    table: Dict[str, Dict[str, list]] = {}
    for row in all_valencies:
        sym = atom_map[int(row[0])]
        charge = str(int(row[1]))
        val = ([int(row[2]), int(row[3])] if explicit_aromaticity
               else int(row[2]))
        table.setdefault(sym, {}).setdefault(charge, [])
        if val not in table[sym][charge]:
            table[sym][charge].append(val)
    for sym in table:
        for ch in table[sym]:
            table[sym][ch].sort(key=lambda v: (v if isinstance(v, int)
                                               else tuple(v)))
    return table


def pack_molecules(mols: Sequence[MoleculeData]):
    """Pack featurized molecules into the flat-slab arrays of
    data.dataset.save_packed."""
    if not mols:
        return (np.zeros((0, 3), np.float32), np.zeros(0, np.int64),
                np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros((0, 2), np.int64), np.zeros((0, 2), np.int64),
                np.zeros((0, 2), np.int64))
    xs, as_, cs, bts, bis, nidx, eidx = [], [], [], [], [], [], []
    n_off = e_off = 0
    for m in mols:
        n = m.positions.shape[0]
        e = m.bond_idxs.shape[0]
        xs.append(m.positions)
        as_.append(m.atom_types)
        cs.append(m.atom_charges)
        bts.append(m.bond_types)
        bis.append(m.bond_idxs)
        nidx.append((n_off, n_off + n))
        eidx.append((e_off, e_off + e))
        n_off += n
        e_off += e
    return (np.concatenate(xs), np.concatenate(as_), np.concatenate(cs),
            np.concatenate(bts) if bts else np.zeros(0, np.int64),
            np.concatenate(bis) if bis else np.zeros((0, 2), np.int64),
            np.asarray(nidx), np.asarray(eidx))
