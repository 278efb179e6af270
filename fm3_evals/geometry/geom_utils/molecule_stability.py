"""Graph-based molecule stability vs the curated GEOM valency tuple table.

Parity target:
/root/reference/fm3_evals/geometry/geom_utils/molecule_stability.py.
Pure numpy (no torch, no RDKit needed for the core check — element symbols
come from a static periodic table slice).
"""

from __future__ import annotations

import numpy as np

from geom_utils.geom_drugs_valency_table import geom_drugs_h_tuple_valencies

# minimal atomic number -> symbol map covering the GEOM/QM9 elements
PERIODIC = {1: "H", 5: "B", 6: "C", 7: "N", 8: "O", 9: "F", 14: "Si",
            15: "P", 16: "S", 17: "Cl", 33: "As", 35: "Br", 53: "I",
            80: "Hg", 83: "Bi", 34: "Se", 13: "Al"}


def _is_valid_valence_tuple(combo, allowed, charge):
    if isinstance(allowed, tuple):
        return combo == allowed
    if isinstance(allowed, (list, set)):
        return combo in allowed
    if isinstance(allowed, dict):
        return _is_valid_valence_tuple(combo, allowed.get(charge, []), charge)
    return False


def compute_molecules_stability_from_graph(adjacency_matrices, numbers,
                                           charges, allowed_bonds=None,
                                           aromatic: bool = True):
    """adjacency_matrices: (B, N, N) bond orders (1.5 = aromatic); numbers:
    (B, N) atomic numbers (0 = padding); charges: (B, N).

    Returns (stable_mask (B,), n_stable_atoms (B,), n_atoms (B,))."""
    adj = np.asarray(adjacency_matrices, np.float64)
    if adj.ndim == 2:
        adj = adj[None]
        numbers = np.asarray(numbers)[None]
        charges = np.asarray(charges)[None]
    numbers = np.asarray(numbers)
    charges = np.asarray(charges)
    if allowed_bonds is None:
        allowed_bonds = geom_drugs_h_tuple_valencies
    if not aromatic:
        assert ((adj == 1.5).sum() == 0) and ((adj == 4).sum() == 0)

    B = adj.shape[0]
    stable_mask = np.zeros(B)
    n_stable_atoms = np.zeros(B)
    n_atoms = np.zeros(B)
    for b in range(B):
        mol_stable = True
        for j in range(adj.shape[1]):
            a_num = int(numbers[b, j])
            if a_num == 0:
                continue
            row = adj[b, j]
            n_arom = int((row == 1.5).sum())
            normal = float((row * (row != 1.5)).sum())
            combo = (n_arom, int(normal))
            sym = PERIODIC.get(a_num, "?")
            if _is_valid_valence_tuple(combo, allowed_bonds.get(sym, {}),
                                       int(charges[b, j])):
                n_stable_atoms[b] += 1
            else:
                mol_stable = False
            n_atoms[b] += 1
        stable_mask[b] = float(mol_stable)
    return stable_mask, n_stable_atoms, n_atoms
