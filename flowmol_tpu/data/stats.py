"""Dataset statistics: n-atoms histograms, marginal distributions, valency
tables.

Parity targets: the reference ships per-dataset stats in `data/` —
`*_n_atoms_histogram.pt` (consumed by FlowMol.build_n_atoms_dist,
flowmol.py:461-471), `*_marginal_dists.pt` (p_a, p_c, p_e, p_c|a; consumed by
dataset.py:41-55), `*_valencies_*.json` (consumed by SampleAnalyzer).  Our
format is .npz / .json; `tools/convert_reference_assets.py` converts the
reference assets.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


class NAtomsDistribution:
    """Categorical over the number of atoms per molecule (training histogram)."""

    def __init__(self, n_atoms: np.ndarray, counts: np.ndarray):
        self.n_atoms = np.asarray(n_atoms, np.int64)
        p = np.asarray(counts, np.float64)
        self.probs = p / p.sum()

    @classmethod
    def load(cls, path) -> "NAtomsDistribution":
        d = np.load(path)
        return cls(d["n_atoms"], d["counts"])

    def save(self, path):
        np.savez(path, n_atoms=self.n_atoms,
                 counts=(self.probs * 1e9).astype(np.int64))

    @classmethod
    def from_sizes(cls, sizes: np.ndarray) -> "NAtomsDistribution":
        vals, counts = np.unique(np.asarray(sizes, np.int64), return_counts=True)
        return cls(vals, counts)

    def sample(self, rng: np.random.Generator, n: int) -> np.ndarray:
        idx = rng.choice(len(self.n_atoms), size=n, p=self.probs)
        return self.n_atoms[idx]

    @property
    def max_atoms(self) -> int:
        return int(self.n_atoms.max())


class MarginalDists:
    """p_a, p_c, p_e marginals and p(c|a) conditional (train split)."""

    def __init__(self, p_a, p_c, p_e, p_c_given_a):
        self.p_a = np.asarray(p_a, np.float32)
        self.p_c = np.asarray(p_c, np.float32)
        self.p_e = np.asarray(p_e, np.float32)
        self.p_c_given_a = np.asarray(p_c_given_a, np.float32)

    @classmethod
    def load(cls, path) -> "MarginalDists":
        d = np.load(path)
        return cls(d["p_a"], d["p_c"], d["p_e"], d["p_c_given_a"])

    def save(self, path):
        np.savez(path, p_a=self.p_a, p_c=self.p_c, p_e=self.p_e,
                 p_c_given_a=self.p_c_given_a)


def compute_p_c_given_a(atom_tokens: np.ndarray, charge_tokens: np.ndarray,
                        n_atom_types: int, n_charges: int = 6) -> np.ndarray:
    """Conditional charge distribution table (utils/dataset_stats.py)."""
    table = np.zeros((n_atom_types, n_charges), np.float64)
    np.add.at(table, (atom_tokens, charge_tokens), 1.0)
    rowsum = table.sum(1, keepdims=True)
    rowsum[rowsum == 0] = 1.0
    return (table / rowsum).astype(np.float32)


def compute_marginals(atom_tokens, charge_tokens, bond_tokens, n_atom_types,
                      n_charges=6, n_bond_types=4,
                      n_no_bond: int = 0) -> MarginalDists:
    """Marginal distributions over atom types, charges and bond orders.

    `bond_tokens` are the *present* bonds (>=1); `n_no_bond` counts absent
    upper-triangle pairs so p_e[0] reflects the no-bond class, matching the
    reference's marginal dists over the dense edge representation."""
    p_a = np.bincount(atom_tokens, minlength=n_atom_types).astype(np.float64)
    p_c = np.bincount(charge_tokens, minlength=n_charges).astype(np.float64)
    p_e = np.bincount(bond_tokens, minlength=n_bond_types).astype(np.float64)
    p_e[0] += n_no_bond
    return MarginalDists(p_a / p_a.sum(), p_c / p_c.sum(), p_e / p_e.sum(),
                         compute_p_c_given_a(atom_tokens, charge_tokens,
                                             n_atom_types, n_charges))


def load_valency_table(path) -> Dict:
    with open(path) as f:
        return json.load(f)
