"""Shared helpers for the geometry evaluation harness.

Parity target: /root/reference/fm3_evals/geometry/geom_utils/utils.py —
validity check, canonical geometry keys, difference statistics, RMSD via
conformer alignment, MMFF optimize-and-drop.  RDKit-gated.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

try:
    from rdkit import Chem
    from rdkit.Chem import AllChem
    HAVE_RDKIT = True
except Exception:  # pragma: no cover
    Chem = AllChem = None
    HAVE_RDKIT = False


def is_valid(mol) -> bool:
    """Single connected fragment that sanitizes cleanly."""
    if mol is None:
        return False
    try:
        if len(Chem.rdmolops.GetMolFrags(mol)) > 1:
            return False
        Chem.SanitizeMol(Chem.Mol(mol))
        return True
    except Exception:
        return False


def bond_symbol(bond_type_numeric: int) -> str:
    return {1: "-", 2: "=", 3: "#", 12: ":"}.get(int(bond_type_numeric), "?")


def generate_canonical_key(*args) -> str:
    """Canonical key for an atom/bond-type tuple so e.g. C-N and N-C hash the
    same: the lexicographically smaller of the forward/reversed renderings."""
    parts = []
    for a in args:
        a = int(a)
        parts.append(bond_symbol(a) if a in (1, 2, 3, 12) else str(a))
    fwd = "".join(parts)
    rev = "".join(reversed(parts))
    return min(fwd, rev)


def compute_statistics(diff_sums):
    """{key: ([diffs], count)} -> {key: (mean, std, weight)}."""
    total = sum(count for _, count in diff_sums.values())
    out = {}
    for key, (diffs, count) in diff_sums.items():
        out[key] = (float(np.mean(diffs)) if count else 0.0,
                    float(np.std(diffs)) if count else 0.0,
                    count / total if total else 0.0)
    return out


def compute_differences(pairs, compute_function):
    diff_sums = defaultdict(lambda: [[], 0])
    for pair in pairs:
        for key, (diffs, count) in compute_function(pair).items():
            diff_sums[key][0].extend(diffs)
            diff_sums[key][1] += count
    return compute_statistics(diff_sums)


def compute_rmsd(init_mol, opt_mol, hydrogens: bool = True):
    """RMSD between initial and optimized coordinates via conformer copy +
    alignment."""
    init_mol = Chem.Mol(init_mol)
    init_mol.AddConformer(opt_mol.GetConformer(), assignId=True)
    if not hydrogens:
        init_mol = Chem.RemoveAllHs(Chem.Mol(init_mol))
    return AllChem.AlignMol(init_mol, init_mol, prbCid=0, refCid=1)


def compute_mmff_energy_drop(mol, max_iters: int = 1000):
    """MMFF energy before minus after optimization; None on failure."""
    try:
        mol_copy = Chem.Mol(mol)
        props = AllChem.MMFFGetMoleculeProperties(mol_copy,
                                                  mmffVariant="MMFF94")
        ff = AllChem.MMFFGetMoleculeForceField(mol_copy, props)
        e_before = ff.CalcEnergy()
        if AllChem.MMFFOptimizeMolecule(mol_copy, maxIters=max_iters) != 0:
            return None
        ff_opt = AllChem.MMFFGetMoleculeForceField(mol_copy, props)
        return e_before - ff_opt.CalcEnergy()
    except Exception:
        return None
