#!/usr/bin/env python
"""Emit SLURM-able sampling/eval command lines for ablation runs.

Parity target: /root/reference/fm3_evals/ablations/gen_cmds/gen_test_cmds.py —
one command per (model, knob setting) combination written to a text file that
a SLURM array job (or xargs) can consume.
"""

import argparse
import itertools
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs_dir", type=Path, default=Path("runs"))
    ap.add_argument("--output", type=Path, default=Path("test_cmds.txt"))
    ap.add_argument("--n_mols", type=int, default=5000)
    ap.add_argument("--n_timesteps", type=int, default=250)
    ap.add_argument("--n_subsets", type=int, default=5)
    ap.add_argument("--stochasticity", type=float, nargs="*", default=[None])
    ap.add_argument("--hc_thresh", type=float, nargs="*", default=[None])
    args = ap.parse_args()

    run_dirs = sorted(p for p in args.runs_dir.iterdir()
                      if (p / "config.yaml").exists())
    cmds = []
    for run, eta, hc in itertools.product(run_dirs, args.stochasticity,
                                          args.hc_thresh):
        parts = [f"python test.py --model_dir {run}",
                 f"--n_mols {args.n_mols}",
                 f"--n_timesteps {args.n_timesteps}",
                 f"--n_subsets {args.n_subsets}", "--metrics"]
        tag = run.name
        if eta is not None:
            parts.append(f"--stochasticity {eta}")
            tag += f"_eta{eta}"
        if hc is not None:
            parts.append(f"--hc_thresh {hc}")
            tag += f"_hc{hc}"
        parts.append(f"--output_file samples/{tag}.sdf")
        parts.append(f"--metrics_file metrics/{tag}.json")
        cmds.append(" ".join(parts))

    args.output.write_text("\n".join(cmds) + "\n")
    print(f"wrote {len(cmds)} commands -> {args.output}")


if __name__ == "__main__":
    main()
