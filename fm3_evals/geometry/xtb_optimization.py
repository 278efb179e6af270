#!/usr/bin/env python
"""GFN2-xTB geometry optimization of sampled SDF files.

Parity target: /root/reference/fm3_evals/geometry/xtb_optimization.py —
per-molecule xtb subprocess in a tempdir, energy-gain/RMSD parsing from xtb
output, optimized+initial SDF outputs, per-molecule crash tolerance, partial
results written in a finally block.  Requires the external `xtb` binary and
RDKit.

Usage: python xtb_optimization.py --input samples.sdf --output_dir out/
"""

import argparse
import os
import pickle
import subprocess
import tempfile
from pathlib import Path

try:
    from rdkit import Chem
except Exception:  # pragma: no cover
    Chem = None


def mol_to_xyz(mol, filename):
    conf = mol.GetConformer()
    with open(filename, "w") as f:
        f.write(f"{mol.GetNumAtoms()}\n\n")
        for atom in mol.GetAtoms():
            p = conf.GetAtomPosition(atom.GetIdx())
            f.write(f"{atom.GetSymbol()} {p.x} {p.y} {p.z}\n")


def run_xtb(xyz_filename, prefix, charge, work_dir):
    out_file = os.path.join(work_dir, f"{prefix}_xtb_output.out")
    cmd = (f"cd {work_dir} && xtb {os.path.basename(xyz_filename)} --opt "
           f"--charge {charge} --namespace {prefix} "
           f"> {os.path.basename(out_file)}")
    subprocess.run(cmd, shell=True)
    with open(out_file) as f:
        return f.read()


def parse_xtb_output(output: str):
    """Extract total energy gain (kcal/mol) and total RMSD (A)."""
    energy_gain = rmsd = None
    for line in output.splitlines():
        if "total energy gain" in line:
            energy_gain = float(line.split()[6])
        elif "total RMSD" in line:
            rmsd = float(line.split()[5])
    return energy_gain, rmsd


def parse_xtbtopo_mol(path):
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with open(path) as f:
        block = f.read()
    mol = Chem.MolFromMolBlock(block, sanitize=False, removeHs=False)
    if mol is None:
        raise ValueError("failed to parse xtbtopo.mol")
    return mol


def process_molecule(mol, idx):
    """Optimize one molecule; returns (init_mol, opt_mol) or (mol, None)."""
    charge = Chem.GetFormalCharge(mol)
    with tempfile.TemporaryDirectory() as work:
        xyz = os.path.join(work, f"mol_{idx}.xyz")
        mol_to_xyz(mol, xyz)
        out = run_xtb(xyz, f"m{idx}", charge, work)
        energy_gain, rmsd = parse_xtb_output(out)
        opt = parse_xtbtopo_mol(os.path.join(work, f"m{idx}.xtbtopo.mol"))
        if energy_gain is not None:
            opt.SetProp("energy_gain", str(energy_gain))
        if rmsd is not None:
            opt.SetProp("xtb_rmsd", str(rmsd))
    return mol, opt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", type=Path, required=True,
                    help="SDF of sampled molecules")
    ap.add_argument("--output_dir", type=Path, required=True)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    if Chem is None:
        raise SystemExit("RDKit is required for xtb optimization")

    args.output_dir.mkdir(parents=True, exist_ok=True)
    reader = Chem.SDMolSupplier(str(args.input), removeHs=False,
                                sanitize=False)
    pairs = []
    init_writer = Chem.SDWriter(str(args.output_dir / "init.sdf"))
    opt_writer = Chem.SDWriter(str(args.output_dir / "optimized.sdf"))
    try:
        for idx, mol in enumerate(reader):
            if mol is None:
                continue
            if args.limit and idx >= args.limit:
                break
            try:
                init_mol, opt_mol = process_molecule(mol, idx)
            except Exception as e:  # per-molecule crash tolerance
                print(f"molecule {idx} failed: {e}")
                pairs.append((mol, None))
                continue
            pairs.append((init_mol, opt_mol))
            init_writer.write(init_mol)
            if opt_mol is not None:
                opt_writer.write(opt_mol)
    finally:
        init_writer.close()
        opt_writer.close()
        with open(args.output_dir / "pairs.pkl", "wb") as f:
            pickle.dump(pairs, f)
        print(f"wrote {len(pairs)} pairs -> {args.output_dir}")


if __name__ == "__main__":
    main()
