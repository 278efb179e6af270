#!/usr/bin/env python
"""Generate a synthetic qm9-like / geom-like dataset for smoke training and
benchmarking in RDKit-less environments.

Usage: python tools/make_synthetic_data.py --out data/synthetic_qm9 \
          [--n 5000] [--hist assets/data/qm9/train_data_n_atoms_histogram.npz]
"""

import argparse
from pathlib import Path

from flowmol_tpu.data.synthetic import generate_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("data/synthetic_qm9"))
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hist", type=str,
                    default="assets/data/qm9/train_data_n_atoms_histogram.npz")
    ap.add_argument("--atom_map", nargs="+",
                    default=["C", "H", "N", "O", "F"])
    args = ap.parse_args()
    out = generate_dataset(args.out, n_molecules=args.n, seed=args.seed,
                           atom_map=tuple(args.atom_map),
                           hist_asset=args.hist)
    print(f"wrote synthetic dataset -> {out}")


if __name__ == "__main__":
    main()
