"""SampleAnalyzer: molecule-quality metric suite.

Parity target: /root/reference/flowmol/analysis/metrics.py
(`SampleAnalyzer.analyze` 95-167, `compute_validity` 170-227,
`check_stability` 333-362, `check_stability_midi` 365-397, energy JS
divergence 229-256, REOS/ring metrics 279-331).

Metric keys match the reference: frac_valid_mols, frac_connected,
avg_frag_frac, avg_num_components, frac_atoms_stable,
frac_mols_stable_valence, energy_js_div, flag_rate, ood_rate, reos_cum_dev,
pb_*.

RDKit-dependent metrics (sanitization validity, MMFF energies, REOS SMARTS,
PoseBusters) are gated: without RDKit, validity falls back to a structural
approximation (connected + all valencies stable) and the gated metrics are
omitted.  Everything else (stability tables, connectivity, fragments) is pure
numpy and always available.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from flowmol_tpu.analysis.molecule_builder import HAVE_RDKIT, SampledMolecule

if HAVE_RDKIT:  # pragma: no cover - depends on env
    from rdkit import Chem

# MiDi's legacy valency table (public MiDi code; used when no dataset-derived
# table exists — e.g. QM9, whose assets ship no valency json).
MIDI_VALENCE_TABLE = {
    "H": {0: 1, 1: 0, -1: 0},
    "C": {0: [3, 4], 1: 3, -1: 3},
    "N": {0: [2, 3], 1: [2, 3, 4], -1: 2},
    "O": {0: 2, 1: 3, -1: 1},
    "F": {0: 1, -1: 0},
    "B": 3, "Al": 3, "Si": 4,
    "P": {0: [3, 5], 1: 4},
    "S": {0: [2, 6], 1: [2, 3], 2: 4, 3: 5, -1: 3},
    "Cl": 1, "As": 3,
    "Br": {0: 1, 1: 2}, "I": 1, "Hg": [1, 2], "Bi": [3, 5],
    "Se": [2, 4, 6],
}


def check_stability(mol: SampledMolecule, table: Dict,
                    explicit_aromaticity: bool = False):
    """Count atoms with valid (element, charge) -> valency combinations
    (metrics.py:333-362).  Returns (n_stable_atoms, mol_stable, n_fake)."""
    n_stable = 0
    vals = mol.valencies
    for i, (sym, charge) in enumerate(zip(mol.atom_types, mol.atom_charges)):
        if sym in ("Sn",):  # fake atoms already stripped, but be safe
            continue
        v = vals[i]
        if explicit_aromaticity:
            key = [int(v[0]), int(v[1])]
        else:
            key = int(v)
        entry = table.get(sym)
        if entry is None:
            continue
        allowed = entry.get(int(charge))
        if allowed is None:
            continue
        if explicit_aromaticity:
            if key in allowed:
                n_stable += 1
        else:
            if key in allowed:
                n_stable += 1
    mol_stable = n_stable == mol.num_atoms
    return n_stable, mol_stable, 0


def check_stability_midi(mol: SampledMolecule, table=MIDI_VALENCE_TABLE):
    """Legacy MiDi stability check (metrics.py:365-397)."""
    n_stable = 0
    mol_stable = True
    for sym, v, charge in zip(mol.atom_types, mol.valencies, mol.atom_charges):
        v = int(v)
        entry = table.get(sym)
        if entry is None:
            is_stable = False
        elif isinstance(entry, int):
            is_stable = entry == v
        elif isinstance(entry, dict):
            allowed = entry.get(int(charge), entry.get(0))
            is_stable = (allowed == v if isinstance(allowed, int)
                         else v in allowed)
        else:
            is_stable = v in entry
        mol_stable = mol_stable and is_stable
        n_stable += int(is_stable)
    return n_stable, mol_stable, 0


class DivergenceCalculator:
    """Jensen-Shannon divergence of an energy histogram vs a saved reference
    distribution (flowmol/utils/divergences.py)."""

    def __init__(self, ref_file):
        # reference format (utils/divergences.py): {'bins': (B+1,), 'p': (B,)}
        d = np.load(ref_file)
        self.bins = d["bins"] if "bins" in d else d[d.files[0]]
        key = "p" if "p" in d else ("hist" if "hist" in d else d.files[1])
        self.ref_hist = d[key]

    @staticmethod
    def save_reference_dist(energies: List[float], path, n_bins: int = 199):
        """Persist a reference energy histogram (utils/divergences.py:6-7)."""
        hist, bins = np.histogram(energies, bins=n_bins, density=False)
        p = hist / max(hist.sum(), 1)
        np.savez(path, bins=bins, p=p)

    def js_divergence(self, energies: List[float]) -> float:
        h, _ = np.histogram(energies, bins=self.bins, density=False)
        p = h / max(h.sum(), 1)
        q = self.ref_hist / max(self.ref_hist.sum(), 1)
        m = 0.5 * (p + q)

        def kl(a, b):
            mask = a > 0
            return float(np.sum(a[mask] * np.log(a[mask] / b[mask])))

        return 0.5 * kl(p, m) + 0.5 * kl(q, m)


class SampleAnalyzer:
    def __init__(self, processed_data_dir: Optional[str] = None,
                 use_midi_valence: bool = False):
        self.processed_data_dir = (Path(processed_data_dir)
                                   if processed_data_dir else None)
        self.explicit_aromaticity = False
        self.valency_table = None
        if not use_midi_valence and self.processed_data_dir is not None:
            files = sorted(self.processed_data_dir.glob(
                "train_data_valencies_*.json"))
            if files:
                with open(files[0]) as f:
                    raw = json.load(f)
                self.valency_table = {
                    sym: {int(ch): v for ch, v in charges.items()}
                    for sym, charges in raw.items()}
                self.explicit_aromaticity = "aromatic" in files[0].name
        self.energy_div_calculator = None
        if self.processed_data_dir is not None:
            f = self.processed_data_dir / "energy_dist.npz"
            if f.exists():
                self.energy_div_calculator = DivergenceCalculator(f)

    def stability_func(self, mol: SampledMolecule):
        if self.valency_table is not None:
            return check_stability(mol, self.valency_table,
                                   self.explicit_aromaticity)
        return check_stability_midi(mol)

    # ------------------------------------------------------------------ main
    def analyze(self, molecules: List[SampledMolecule],
                energy_div: bool = False, functional_validity: bool = False,
                posebusters: bool = False) -> Dict[str, float]:
        n_atoms = n_stable_atoms = n_stable_mols = 0
        for mol in molecules:
            ns, stable, n_fake = self.stability_func(mol)
            n_atoms += mol.num_atoms - n_fake
            n_stable_atoms += ns
            n_stable_mols += int(stable)

        metrics = self.compute_validity(molecules)
        metrics["frac_atoms_stable"] = n_stable_atoms / max(n_atoms, 1)
        metrics["frac_mols_stable_valence"] = n_stable_mols / max(
            len(molecules), 1)

        if functional_validity and HAVE_RDKIT:
            metrics.update(self.reos_and_rings(molecules))
        if energy_div and HAVE_RDKIT and self.energy_div_calculator is not None:
            metrics["energy_js_div"] = self.compute_energy_divergence(molecules)
        if posebusters and HAVE_RDKIT:
            metrics.update(self.run_posebusters(molecules))
        return metrics

    # -------------------------------------------------------------- validity
    def compute_validity(self, molecules: List[SampledMolecule]) -> Dict:
        """RDKit sanitization validity + fragment stats (metrics.py:170-227).
        Without RDKit: structural approximation, documented in the module
        docstring."""
        n_valid = n_connected = 0
        num_components, frag_fracs = [], []
        errors = defaultdict(int)
        for mol in molecules:
            if mol.num_atoms == 0:
                errors["empty"] += 1
                continue
            nc = mol.num_components
            num_components.append(nc)
            if nc > 1:
                errors["disconnected"] += 1
            else:
                n_connected += 1
            frag_fracs.append(mol.largest_frag_frac)

            if HAVE_RDKIT:
                rdmol = mol.rdkit_mol  # cached; fragments below are copies
                if rdmol is None:
                    errors["build"] += 1
                    continue
                try:
                    frags = Chem.rdmolops.GetMolFrags(rdmol, asMols=True,
                                                      sanitizeFrags=False)
                    largest = max(frags, default=rdmol,
                                  key=lambda m: m.GetNumAtoms())
                    Chem.SanitizeMol(largest)
                    Chem.MolToSmiles(largest)
                    n_valid += 1
                except Exception:
                    errors["sanitize"] += 1
            else:
                # structural proxy: connected and all valencies in-table
                _, stable, _ = self.stability_func(mol)
                if nc == 1 and stable:
                    n_valid += 1

        n = max(len(molecules), 1)
        # the proxy is labeled with its own key so no consumer can mistake
        # a structural approximation for RDKit sanitize+SMILES validity
        # (the reference's frac_valid_mols, metrics.py:170-227)
        valid_key = ("frac_valid_mols" if HAVE_RDKIT
                     else "frac_valid_mols_structural")
        return {
            valid_key: n_valid / n,
            "avg_frag_frac": float(np.mean(frag_fracs)) if frag_fracs else 0.0,
            "avg_num_components": (float(np.mean(num_components))
                                   if num_components else 0.0),
            "frac_connected": n_connected / n,
        }

    # ---------------------------------------------------------------- energy
    def compute_sample_energy(self, molecules: List[SampledMolecule]):
        from flowmol_tpu.analysis.ff_energy import compute_mmff_energy
        energies = []
        for mol in molecules:
            rdmol = mol.rdkit_mol
            if rdmol is None:
                continue
            try:
                Chem.SanitizeMol(rdmol)
            except Exception:
                continue
            e = compute_mmff_energy(rdmol)
            if e is not None:
                energies.append(e)
        return energies

    def compute_energy_divergence(self, molecules) -> float:
        energies = self.compute_sample_energy(molecules)
        return self.energy_div_calculator.js_divergence(energies)

    # ----------------------------------------------------------- REOS / rings
    def reos_and_rings(self, molecules: List[SampledMolecule],
                       return_raw: bool = False) -> Dict:
        """REOS flag rate + ring-system OOD (+ raw flag matrix / ring counts
        with return_raw, parity with metrics.py:258-331 return_raw)."""
        try:
            from flowmol_tpu.analysis.reos import REOS
            from flowmol_tpu.analysis.ring_systems import RingSystemCounter
        except Exception:
            return {}
        sanitized = []
        for mol in molecules:
            if mol.rdkit_mol is None:
                continue
            rdmol = Chem.Mol(mol.rdkit_mol)  # copy: SanitizeMol mutates
            try:
                Chem.SanitizeMol(rdmol)
                sanitized.append(rdmol)
            except Exception:
                continue
        if not sanitized:
            return {"flag_rate": -1.0, "ood_rate": -1.0}
        reos = REOS(active_rules=["Glaxo", "Dundee"])
        flags = reos.mols_to_flag_arr(sanitized)
        flag_rate = flags.sum() / flags.shape[0]
        counter = RingSystemCounter()
        sample_counts, chembl_counts, n_mols = counter.count_ring_systems(
            sanitized)
        ood = sum(s for s, c in zip(sample_counts.values(),
                                    chembl_counts.values()) if c == 0)
        out = {"flag_rate": float(flag_rate), "ood_rate": ood / n_mols}

        # cumulative REOS deviation vs the training profile when available
        # (metrics.py:258-331, 401-416: sum |flag_rate_model - flag_rate_train|
        # per rule; the reference auto-downloads train_reos_ring_counts.pkl)
        train_ref = None
        if self.processed_data_dir is not None:
            f = self.processed_data_dir / "train_reos_ring_counts.pkl"
            if f.exists():
                import pickle
                with open(f, "rb") as fh:
                    train_ref = pickle.load(fh)
        if train_ref is not None:
            ref_flags = np.asarray(train_ref["reos_flag_arr"])
            ref_names = list(train_ref["reos_flag_header"])
            ref_rates = dict(zip(ref_names, ref_flags.mean(0)))
            model_rates = dict(zip(reos.flag_arr_header, flags.mean(0)))
            common = [n for n in reos.flag_arr_header if n in ref_rates]
            out["reos_cum_dev"] = float(sum(
                abs(model_rates[n] - ref_rates[n]) for n in common))
        if return_raw:
            out["reos_flag_arr"] = flags
            out["reos_flag_header"] = list(reos.flag_arr_header)
            out["ring_sample_counts"] = sample_counts
            out["ring_chembl_counts"] = chembl_counts
        return out

    # ------------------------------------------------------------ posebusters
    def run_posebusters(self, molecules, pb_energy: bool = False) -> Dict:
        try:
            import posebusters as pb
            import yaml
        except Exception:
            return {}
        rdmols = [m.rdkit_mol for m in molecules]
        if pb_energy:
            config = "mol"  # full preset incl. energy ratio
        else:
            with open(Path(__file__).parent / "pb_config.yaml") as f:
                config = yaml.safe_load(f)
        buster = pb.PoseBusters(config=config)
        df = buster.bust(rdmols, None, None)
        out = {f"pb_{k}": float(v) for k, v in df.mean().to_dict().items()}
        valid = df[df["sanitization"] == True].values.astype(bool)  # noqa: E712
        out["pb_valid"] = float(valid.all(axis=1).sum() / df.shape[0])
        return out
