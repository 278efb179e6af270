#!/usr/bin/env python
"""Run the SampleAnalyzer on the *training data itself* to establish
reference metric levels.

Parity target: /root/reference/dataset_metrics.py — batched aggregation over
dataset molecules -> metrics_fm3.pkl-style output.

Usage: python dataset_metrics.py --config configs/dev.yml [--n_mols 2000]
"""

import argparse
import json
import pickle
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=Path, required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--n_mols", type=int, default=5000)
    ap.add_argument("--output", type=Path, default=Path("dataset_metrics.pkl"))
    args = ap.parse_args()

    from flowmol_tpu.analysis.metrics import SampleAnalyzer
    from flowmol_tpu.analysis.molecule_builder import SampledMolecule
    from flowmol_tpu.api import read_config_file, resolve_data_dir
    from flowmol_tpu.data.dataset import PackedDataset

    config = read_config_file(args.config)
    data_dir = resolve_data_dir(config["dataset"]["processed_data_dir"])
    atom_map = config["dataset"]["atom_map"]
    ds = PackedDataset(data_dir / f"{args.split}_data_processed.npz")

    n = min(args.n_mols, len(ds))
    mols = []
    for i in range(n):
        m = ds.get_molecule(i)
        mols.append(SampledMolecule(
            m["x"], m["a"], np.clip(m["c"] + 2, 0, 5), m["adj"], atom_map,
            ctmc_mol=False))

    analyzer = SampleAnalyzer(processed_data_dir=data_dir)
    metrics = analyzer.analyze(mols, functional_validity=True)

    # persist the reference MMFF energy distribution for energy_js_div
    # (parity: utils/divergences.py save_reference_dist)
    from flowmol_tpu.analysis.molecule_builder import HAVE_RDKIT
    if HAVE_RDKIT:
        energies = analyzer.compute_sample_energy(mols)
        if energies:
            from flowmol_tpu.analysis.metrics import DivergenceCalculator
            DivergenceCalculator.save_reference_dist(
                energies, data_dir / "energy_dist.npz")
            print(f"wrote energy_dist.npz ({len(energies)} energies)")
    print(json.dumps(metrics, indent=2, default=float))
    with open(args.output, "wb") as f:
        pickle.dump(metrics, f)
    print(f"wrote -> {args.output}")


if __name__ == "__main__":
    main()
