#!/usr/bin/env python
"""Promote a training run to trained_models/<name>: copy config + the latest
(or chosen) checkpoint, then record measured sampling metrics.

Usage:
    python tools/ship_model.py runs/<run_dir> qm9_synth_ctmc \
        [--step N] [--metrics_file m.json]

The metrics file (from `test.py --metrics --metrics_file ...`) is embedded
into the shipped model dir as `metrics.json` so quality claims stay attached
to the exact checkpoint + eval protocol that produced them.
"""

import argparse
import json
import shutil
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("name", type=str)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--metrics_file", type=Path, default=None)
    ap.add_argument("--out_base", type=Path, default=Path("trained_models"))
    args = ap.parse_args()

    ckpts = args.run_dir / "checkpoints"
    steps = sorted(int(p.name) for p in ckpts.iterdir()
                   if p.is_dir() and p.name.isdigit())
    if not steps:
        raise SystemExit(f"no checkpoints under {ckpts}")
    step = args.step if args.step is not None else steps[-1]
    if step not in steps:
        raise SystemExit(f"step {step} not in {steps}")

    dst = args.out_base / args.name
    if dst.exists():
        shutil.rmtree(dst)
    (dst / "checkpoints").mkdir(parents=True)
    shutil.copy2(args.run_dir / "config.yaml", dst / "config.yaml")
    shutil.copytree(ckpts / str(step), dst / "checkpoints" / str(step))

    if args.metrics_file and not args.metrics_file.exists():
        raise SystemExit(f"--metrics_file {args.metrics_file} does not exist; "
                         "refusing to ship a model without its metrics")
    if args.metrics_file:
        with open(args.metrics_file) as f:
            metrics = json.load(f)
        metrics["_checkpoint_step"] = step
        with open(dst / "metrics.json", "w") as f:
            json.dump(metrics, f, indent=2)

    size_mb = sum(p.stat().st_size for p in dst.rglob("*")
                  if p.is_file()) / 1e6
    print(f"shipped {args.run_dir} step {step} -> {dst} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
