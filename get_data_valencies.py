#!/usr/bin/env python
"""Build observed valency tables from a processed dataset.

Parity target: /root/reference/get_data_valencies.py — scans dataset graphs,
accumulates (element, charge) -> valency observations, flags odd-ball
valencies, writes the `*_valencies_*.json` tables SampleAnalyzer consumes.

Usage: python get_data_valencies.py --config configs/dev.yml
"""

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=Path, required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--min_count", type=int, default=1,
                    help="drop valencies observed fewer than this many times")
    args = ap.parse_args()

    from flowmol_tpu.api import read_config_file, resolve_data_dir
    from flowmol_tpu.data.dataset import PackedDataset

    config = read_config_file(args.config)
    data_dir = resolve_data_dir(config["dataset"]["processed_data_dir"])
    atom_map = config["dataset"]["atom_map"]
    explicit_aromaticity = bool(
        config.get("mol_fm", {}).get("explicit_aromaticity", False))
    ds = PackedDataset(data_dir / f"{args.split}_data_processed.npz")

    counts = defaultdict(int)
    order = np.array([0.0, 1.0, 2.0, 3.0, 1.5])
    for i in range(len(ds)):
        m = ds.get_molecule(i)
        adj = order[np.clip(m["adj"], 0, 4)]
        if explicit_aromaticity:
            n_arom = (adj == 1.5).sum(1)
            non_arom = (adj.sum(1) - n_arom * 1.5).astype(int)
            for a, c, na, nv in zip(m["a"], m["c"], n_arom, non_arom):
                counts[(atom_map[int(a)], int(c), (int(na), int(nv)))] += 1
        else:
            val = adj.sum(1).astype(int)
            for a, c, v in zip(m["a"], m["c"], val):
                counts[(atom_map[int(a)], int(c), int(v))] += 1

    table = {}
    oddballs = []
    for (sym, charge, v), cnt in sorted(counts.items(), key=str):
        if cnt < args.min_count:
            oddballs.append({"atom": sym, "charge": charge, "valency": v,
                             "count": cnt})
            continue
        entry = list(v) if isinstance(v, tuple) else v
        table.setdefault(sym, {}).setdefault(str(charge), [])
        if entry not in table[sym][str(charge)]:
            table[sym][str(charge)].append(entry)

    suffix = "aromatic" if explicit_aromaticity else "kekulized"
    out = data_dir / f"{args.split}_data_valencies_{suffix}.json"
    with open(out, "w") as f:
        json.dump(table, f, indent=2)
    print(f"wrote {out}")
    if oddballs:
        print(f"{len(oddballs)} odd-ball valencies below min_count:")
        for o in oddballs[:20]:
            print(f"  {o}")


if __name__ == "__main__":
    main()
