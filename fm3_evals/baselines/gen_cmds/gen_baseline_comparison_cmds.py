#!/usr/bin/env python
"""Emit compute_baseline_comparison command lines, one per sample file.

Parity target:
/root/reference/fm3_evals/baselines/gen_cmds/gen_baseline_comparison_cmds.py —
sweep a directory of external models' sample files (SDF/XYZ/PKL) and write one
analysis command per file; extra CLI args pass through verbatim.
"""

import argparse
from pathlib import Path

COMPARE_SCRIPT = (Path(__file__).resolve().parents[1] /
                  "compute_baseline_comparison.py")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("samples_dir", type=Path,
                    help="directory of sample files to analyze")
    ap.add_argument("--file_pattern", type=str, default="*",
                    help="glob for sample files, e.g. '*.sdf'")
    ap.add_argument("--output_dir", type=Path, default=None)
    ap.add_argument("--cmd_file", type=Path,
                    default=Path("baseline_comparison_cmds.sh"))
    args, passthrough = ap.parse_known_args()

    out_dir = args.output_dir or args.samples_dir
    extra = (" " + " ".join(passthrough)) if passthrough else ""
    cmds = []
    for f in sorted(args.samples_dir.resolve().glob(args.file_pattern)):
        if not f.is_file():
            continue
        out = out_dir / f"{f.stem}_metrics.json"
        cmds.append(f"python {COMPARE_SCRIPT} --samples {f} "
                    f"--output {out}{extra}\n")

    args.cmd_file.parent.mkdir(parents=True, exist_ok=True)
    with open(args.cmd_file, "w") as fh:
        fh.writelines(cmds)
    print(f"wrote {len(cmds)} commands -> {args.cmd_file}")


if __name__ == "__main__":
    main()
