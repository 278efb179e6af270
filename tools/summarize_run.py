#!/usr/bin/env python
"""Summarize a run's metrics.jsonl: loss trajectory + in-training sample
quality, compact enough to paste into docs.

Usage: python tools/summarize_run.py runs/<run_dir> [--last N]
"""

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("--last", type=int, default=5)
    args = ap.parse_args()

    train, val, evals = [], [], []
    with open(args.run_dir / "metrics.jsonl") as f:
        for line in f:
            d = json.loads(line)
            if "total_train_loss" in d:
                train.append(d)
            elif "total_val_loss" in d:
                val.append(d)
            elif "frac_valid_mols" in d or "frac_valid_mols_structural" in d:
                evals.append(d)

    def fmt(d, keys):
        return "  ".join(f"{k}={d[k]:.4g}" for k in keys if k in d)

    print(f"run: {args.run_dir}")
    if train:
        first, last = train[0], train[-1]
        print(f"train: {len(train)} logged steps, "
              f"loss {first['total_train_loss']:.3f} -> "
              f"{last['total_train_loss']:.3f} "
              f"(step {last.get('step')}, epoch "
              f"{last.get('epoch_exact', 0):.1f}, "
              f"{last.get('samples_per_sec', 0):.0f} samples/s)")
    if val:
        print(f"val:   last {fmt(val[-1], ['total_val_loss', 'x_val_loss', 'a_val_loss', 'e_val_loss'])}")
    if evals:
        print(f"in-training sampling evals ({len(evals)}; model-default timestep protocol):")
        for d in evals[-args.last:]:
            print(f"  step {d.get('step'):>7}  "
                  f"{fmt(d, ['frac_valid_mols', 'frac_valid_mols_structural', 'frac_atoms_stable', 'frac_connected', 'frac_mols_stable_valence'])}")


if __name__ == "__main__":
    main()
