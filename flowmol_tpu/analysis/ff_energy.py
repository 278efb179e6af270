"""MMFF/UFF single-point energies via RDKit (parity:
/root/reference/flowmol/analysis/ff_energy.py:8-17).  Gated on RDKit."""

from __future__ import annotations


def compute_mmff_energy(rdmol, force_field: str = "mmff"):
    try:
        from rdkit.Chem import AllChem
    except Exception:  # pragma: no cover
        return None
    try:
        if force_field == "mmff":
            props = AllChem.MMFFGetMoleculeProperties(rdmol)
            if props is None:
                return None
            ff = AllChem.MMFFGetMoleculeForceField(rdmol, props)
        else:
            ff = AllChem.UFFGetMoleculeForceField(rdmol)
        if ff is None:
            return None
        return ff.CalcEnergy()
    except Exception:
        return None
