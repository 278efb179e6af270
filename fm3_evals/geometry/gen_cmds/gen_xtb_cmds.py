#!/usr/bin/env python
"""Emit xtb-optimization + rmsd_energy command lines for sampled SDF files.

Parity target: the SLURM command generators under
/root/reference/fm3_evals/*/gen_cmds/ (xtb fan-out via job arrays,
fm3_evals/readme.md:30-35).
"""

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples_dir", type=Path, default=Path("samples"))
    ap.add_argument("--output_dir", type=Path, default=Path("xtb_out"))
    ap.add_argument("--output", type=Path, default=Path("xtb_cmds.txt"))
    ap.add_argument("--n_subsets", type=int, default=5)
    args = ap.parse_args()

    cmds = []
    for sdf in sorted(args.samples_dir.glob("*.sdf")):
        out = args.output_dir / sdf.stem
        cmds.append(
            f"python fm3_evals/geometry/xtb_optimization.py --input {sdf} "
            f"--output_dir {out} && "
            f"python fm3_evals/geometry/rmsd_energy.py --pairs {out}/pairs.pkl "
            f"--n_subsets {args.n_subsets} --output {out}/metrics.json")
    args.output.write_text("\n".join(cmds) + "\n")
    print(f"wrote {len(cmds)} commands -> {args.output}")


if __name__ == "__main__":
    main()
