"""Per-bond / per-angle / per-torsion deviation statistics between initial and
optimized conformers, keyed by canonical atom/bond-type tuples.

Parity target: /root/reference/fm3_evals/geometry/geom_utils/pair_geometry.py.
"""

from __future__ import annotations

import numpy as np

from geom_utils.utils import generate_canonical_key

try:
    from rdkit.Chem import rdMolTransforms
except Exception:  # pragma: no cover
    rdMolTransforms = None


def compute_bond_lengths_diff(pair):
    init_mol, opt_mol = pair
    out = {}
    ic, oc = init_mol.GetConformer(), opt_mol.GetConformer()
    for bond in init_mol.GetBonds():
        i, j = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        key = generate_canonical_key(
            init_mol.GetAtomWithIdx(i).GetAtomicNum(),
            int(bond.GetBondType()),
            init_mol.GetAtomWithIdx(j).GetAtomicNum())
        diff = abs(rdMolTransforms.GetBondLength(ic, i, j) -
                   rdMolTransforms.GetBondLength(oc, i, j))
        out.setdefault(key, [[], 0])
        out[key][0].append(diff)
        out[key][1] += 1
    return out


def compute_bond_angles_diff(pair):
    init_mol, opt_mol = pair
    out = {}
    ic, oc = init_mol.GetConformer(), opt_mol.GetConformer()
    for atom in init_mol.GetAtoms():
        nbrs = atom.GetNeighbors()
        if len(nbrs) < 2:
            continue
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                i1, i2, i3 = nbrs[i].GetIdx(), atom.GetIdx(), nbrs[j].GetIdx()
                bt1 = int(init_mol.GetBondBetweenAtoms(i1, i2).GetBondType())
                bt2 = int(init_mol.GetBondBetweenAtoms(i2, i3).GetBondType())
                key = generate_canonical_key(
                    init_mol.GetAtomWithIdx(i1).GetAtomicNum(), bt1,
                    init_mol.GetAtomWithIdx(i2).GetAtomicNum(), bt2,
                    init_mol.GetAtomWithIdx(i3).GetAtomicNum())
                a0 = rdMolTransforms.GetAngleDeg(ic, i1, i2, i3)
                a1 = rdMolTransforms.GetAngleDeg(oc, i1, i2, i3)
                diff = min(abs(a0 - a1), 360 - abs(a0 - a1))
                out.setdefault(key, [[], 0])
                out[key][0].append(diff)
                out[key][1] += 1
    return out


def compute_torsion_angles_diff(pair):
    init_mol, opt_mol = pair
    out = {}
    ic, oc = init_mol.GetConformer(), opt_mol.GetConformer()
    for bond in init_mol.GetBonds():
        i2, i3 = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        a2, a3 = init_mol.GetAtomWithIdx(i2), init_mol.GetAtomWithIdx(i3)
        for n1 in a2.GetNeighbors():
            if n1.GetIdx() == i3:
                continue
            for n4 in a3.GetNeighbors():
                if n4.GetIdx() in (i2, n1.GetIdx()):
                    continue
                i1, i4 = n1.GetIdx(), n4.GetIdx()
                key = generate_canonical_key(
                    n1.GetAtomicNum(),
                    int(init_mol.GetBondBetweenAtoms(i1, i2).GetBondType()),
                    a2.GetAtomicNum(), int(bond.GetBondType()),
                    a3.GetAtomicNum(),
                    int(init_mol.GetBondBetweenAtoms(i3, i4).GetBondType()),
                    n4.GetAtomicNum())
                t0 = rdMolTransforms.GetDihedralDeg(ic, i1, i2, i3, i4)
                t1 = rdMolTransforms.GetDihedralDeg(oc, i1, i2, i3, i4)
                diff = min(abs(t0 - t1), 360 - abs(t0 - t1))
                out.setdefault(key, [[], 0])
                out[key][0].append(diff)
                out[key][1] += 1
    return out
