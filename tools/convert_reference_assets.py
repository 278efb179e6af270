#!/usr/bin/env python
"""Convert the reference's shipped dataset statistics (.pt/.json, data assets,
not code) into flowmol_tpu's .npz format.

Usage: python tools/convert_reference_assets.py [--src /root/reference/data] \
          [--dst assets/data]
"""

import argparse
import json
import shutil
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/data")
    ap.add_argument("--dst", default="assets/data")
    args = ap.parse_args()

    import torch  # cpu torch, only used for this offline conversion

    src = Path(args.src)
    dst = Path(args.dst)
    for ds_dir in sorted(src.iterdir()):
        if not ds_dir.is_dir():
            continue
        out = dst / ds_dir.name
        out.mkdir(parents=True, exist_ok=True)
        for f in sorted(ds_dir.iterdir()):
            if f.name.endswith("_n_atoms_histogram.pt"):
                n_atoms, counts = torch.load(f, map_location="cpu")
                np.savez(out / (f.stem + ".npz"),
                         n_atoms=n_atoms.numpy().astype(np.int64),
                         counts=counts.numpy().astype(np.int64))
            elif f.name.endswith("_marginal_dists.pt"):
                p_a, p_c, p_e, p_c_given_a = torch.load(f, map_location="cpu")
                np.savez(out / (f.stem + ".npz"),
                         p_a=p_a.numpy(), p_c=p_c.numpy(), p_e=p_e.numpy(),
                         p_c_given_a=p_c_given_a.numpy())
            elif f.suffix in (".json", ".npz"):
                shutil.copy(f, out / f.name)
        print(f"converted {ds_dir.name} -> {out}")


if __name__ == "__main__":
    main()
