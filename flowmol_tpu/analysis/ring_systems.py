"""Ring-system counting against the ChEMBL lookup.

Parity: /root/reference/flowmol/analysis/ring_systems.py — counts ring
systems per molecule and how often each appears in ChEMBL (OOD = count 0).
Gated on useful_rdkit_utils.
"""

from __future__ import annotations

from collections import Counter


class RingSystemCounter:
    def __init__(self):
        import useful_rdkit_utils as uru  # gated import
        self.lookup = uru.RingSystemLookup.default()

    def count_ring_systems(self, mols):
        sample_counts: Counter = Counter()
        chembl_counts = {}
        for mol in mols:
            for ring_smiles, chembl_count in self.lookup.process_mol(mol):
                sample_counts[ring_smiles] += 1
                chembl_counts[ring_smiles] = chembl_count
        return sample_counts, chembl_counts, len(mols)
