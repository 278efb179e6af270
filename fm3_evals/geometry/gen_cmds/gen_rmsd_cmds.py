#!/usr/bin/env python
"""Emit rmsd_energy command lines pairing init/minimized SDFs per model dir.

Parity target: /root/reference/fm3_evals/ablations/gen_cmds/gen_rmsd_cmds.py
and baselines/gen_cmds/gen_rmsd_cmds.py — one `rmsd_energy.py` command per
model directory whose samples/ holds both the xtb init and minimized SDFs,
written to a text file a SLURM array job (or xargs -L1) can consume.
"""

import argparse
from pathlib import Path

RMSD_SCRIPT = Path(__file__).resolve().parents[1] / "rmsd_energy.py"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models_dir", type=Path,
                    help="directory of model run directories")
    ap.add_argument("--init_mols_name", type=str, default="xtb_init_mols.sdf")
    ap.add_argument("--min_mols_name", type=str,
                    default="xtb_minimized_mols.sdf")
    ap.add_argument("--cmd_file", type=Path, default=Path("rmsd_cmds.txt"))
    ap.add_argument("--n_subsets", type=int, default=5)
    args = ap.parse_args()

    cmds = []
    for model_dir in sorted(args.models_dir.resolve().iterdir()):
        if not model_dir.is_dir():
            continue
        samples = model_dir / "samples"
        init_f = samples / args.init_mols_name
        min_f = samples / args.min_mols_name
        if not init_f.exists() or not min_f.exists():
            print(f"skipping {model_dir.name}: missing {init_f.name} or "
                  f"{min_f.name}")
            continue
        cmds.append(f"python {RMSD_SCRIPT} --init_sdf {init_f} "
                    f"--opt_sdf {min_f} --n_subsets={args.n_subsets}\n")

    with open(args.cmd_file, "w") as f:
        f.writelines(cmds)
    print(f"wrote {len(cmds)} commands -> {args.cmd_file}")


if __name__ == "__main__":
    main()
