#!/usr/bin/env python
"""Aggregate xtb energy gain / MMFF drop / RMSD metrics over optimized pairs.

Parity target: /root/reference/fm3_evals/geometry/rmsd_energy.py —
mean/median metrics with optional n-subset 95% CIs.
"""

import argparse
import json
import pickle
from collections import defaultdict
from pathlib import Path

import numpy as np

from geom_utils.utils import compute_mmff_energy_drop, compute_rmsd, is_valid


def compute_metrics_for_pairs(pairs, hydrogens: bool = True):
    energy_gains, mmff_drops, rmsds = [], [], []
    counter = defaultdict(int)
    for init_mol, opt_mol in pairs:
        if init_mol is None or opt_mol is None or not is_valid(init_mol):
            continue
        try:
            eg = (float(opt_mol.GetProp("energy_gain"))
                  if opt_mol.HasProp("energy_gain") else None)
            rmsd = compute_rmsd(init_mol, opt_mol, hydrogens=hydrogens)
            drop = compute_mmff_energy_drop(init_mol)
            if eg is not None:
                energy_gains.append(-eg)
            else:
                counter["missing_energy_gain"] += 1
            if rmsd is not None:
                rmsds.append(rmsd)
            else:
                counter["missing_rmsd"] += 1
            if drop is not None:
                mmff_drops.append(drop)
            else:
                counter["missing_mmff_drop"] += 1
            counter["successful_pairs"] += 1
        except Exception as e:
            print(e)
            continue
    return {
        "avg_energy_gain": float(np.mean(energy_gains)) if energy_gains else 0.0,
        "med_energy_gain": float(np.median(energy_gains)) if energy_gains else 0.0,
        "avg_rmsd": float(np.mean(rmsds)) if rmsds else 0.0,
        "med_rmsd": float(np.median(rmsds)) if rmsds else 0.0,
        "avg_mmff_drop": float(np.mean(mmff_drops)) if mmff_drops else 0.0,
        "med_mmff_drop": float(np.median(mmff_drops)) if mmff_drops else 0.0,
        "n": len(energy_gains),
    }


def split_into_subsets(pairs, n_subsets):
    idxs = np.array_split(np.arange(len(pairs)), n_subsets)
    return [[pairs[i] for i in sub] for sub in idxs]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=Path, required=True,
                    help="pairs.pkl from xtb_optimization.py")
    ap.add_argument("--n_subsets", type=int, default=1)
    ap.add_argument("--no_hydrogens", action="store_true")
    ap.add_argument("--output", type=Path, default=None)
    args = ap.parse_args()

    with open(args.pairs, "rb") as f:
        pairs = pickle.load(f)

    hydrogens = not args.no_hydrogens
    if args.n_subsets > 1:
        per = [compute_metrics_for_pairs(s, hydrogens)
               for s in split_into_subsets(pairs, args.n_subsets)]
        metrics = {}
        for k in per[0]:
            vals = np.array([m[k] for m in per], np.float64)
            metrics[k] = float(vals.mean())
            metrics[f"{k}_ci"] = float(1.96 * vals.std(ddof=1) /
                                       np.sqrt(len(vals)))
    else:
        metrics = compute_metrics_for_pairs(pairs, hydrogens)

    print(json.dumps(metrics, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
