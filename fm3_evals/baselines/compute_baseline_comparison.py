#!/usr/bin/env python
"""Re-analyze external models' sample files with the shared metric suite.

Parity target: /root/reference/fm3_evals/baselines/compute_baseline_comparison.py
— load SDF or baseline pickles ({'rdkit_mols': [...], 'sampling_time': t}),
convert through SampledMolecule, run SampleAnalyzer with subset CIs.
"""

import argparse
import json
import pickle
from pathlib import Path

import numpy as np


def load_samples(path: Path):
    if path.suffix == ".pkl":
        with open(path, "rb") as f:
            data = pickle.load(f)
        return data.get("rdkit_mols", data), data.get("sampling_time")
    from rdkit import Chem
    mols = [m for m in Chem.SDMolSupplier(str(path), removeHs=False,
                                          sanitize=False) if m is not None]
    return mols, None


def rdkit_to_sampled(mols, atom_type_map=None):
    """RDKit mols -> SampledMolecule via the class's own reverse constructor
    (parity: molecule_builder.py:86-128)."""
    from flowmol_tpu.analysis.molecule_builder import SampledMolecule

    return [SampledMolecule.from_rdkit_mol(m, atom_type_map=atom_type_map)
            for m in mols if m is not None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=Path, required=True,
                    help="SDF or baseline pickle")
    ap.add_argument("--processed_data_dir", type=Path, default=None)
    ap.add_argument("--n_subsets", type=int, default=1)
    ap.add_argument("--output", type=Path, default=None)
    args = ap.parse_args()

    from flowmol_tpu.analysis.metrics import SampleAnalyzer

    rdmols, sampling_time = load_samples(args.samples)
    mols = rdkit_to_sampled(rdmols)
    analyzer = SampleAnalyzer(processed_data_dir=args.processed_data_dir)

    if args.n_subsets > 1:
        subsets = np.array_split(np.arange(len(mols)), args.n_subsets)
        per = [analyzer.analyze([mols[i] for i in idx],
                                functional_validity=True) for idx in subsets]
        metrics = {}
        for k in per[0]:
            vals = np.array([m[k] for m in per], np.float64)
            metrics[k] = float(vals.mean())
            metrics[f"{k}_ci"] = float(1.96 * vals.std(ddof=1) /
                                       np.sqrt(len(vals)))
    else:
        metrics = analyzer.analyze(mols, functional_validity=True)

    if sampling_time is not None:
        metrics["sampling_time"] = sampling_time
    print(json.dumps(metrics, indent=2, default=float))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(metrics, f, indent=2, default=float)


if __name__ == "__main__":
    main()
