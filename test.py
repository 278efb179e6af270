#!/usr/bin/env python
"""Sampling / evaluation entry point ("model testing" in the ML sense).

Parity target: /root/reference/test.py — batched sampling with wall-clock
timing, SDF/XYZ output, --metrics via SampleAnalyzer, CTMC knobs
--stochasticity/--hc_thresh, --n_subsets CIs.
"""

import argparse
import json
import pickle
import time
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Sample molecules from a trained model")
    p.add_argument("--model_dir", type=Path, help="run dir (config.yaml + checkpoints/)")
    p.add_argument("--checkpoint", type=int, default=None,
                   help="checkpoint step to load (default: latest)")
    p.add_argument("--n_atoms_per_mol", type=int, default=None,
                   help="fixed atom count for every molecule (default: sample"
                        " sizes from the training histogram)")
    p.add_argument("--model_name", type=str, help="name in trained_models/")
    p.add_argument("--n_mols", type=int, default=100)
    p.add_argument("--n_timesteps", type=int, default=250)
    p.add_argument("--max_batch_size", type=int, default=128)
    p.add_argument("--output_file", type=Path, default=None)
    p.add_argument("--metrics", action="store_true")
    p.add_argument("--metrics_file", type=Path, default=None)
    p.add_argument("--n_subsets", type=int, default=1,
                   help="compute 95%% CIs over n subsets")
    p.add_argument("--stochasticity", type=float, default=None)
    p.add_argument("--hc_thresh", type=float, default=None)
    p.add_argument("--dfm_type", type=str, default=None)
    p.add_argument("--simplex_project", action="store_true",
                   help="endpoint/vector-field only: project categorical "
                        "states back onto the probability simplex after "
                        "every Euler step (keeps network inputs on the "
                        "manifold training presented; the reference "
                        "integrates unprojected)")
    p.add_argument("--baseline_comparison", action="store_true",
                   help="pickle (mols, sampling_time) for baseline comparison")
    p.add_argument("--xt_traj", action="store_true",
                   help="write per-molecule x_t trajectory XYZ files")
    p.add_argument("--ep_traj", action="store_true",
                   help="write per-molecule predicted-endpoint trajectory XYZ")
    p.add_argument("--traj_dir", type=Path, default=Path("trajectories"))
    p.add_argument("--profile", type=Path, default=None,
                   help="capture a jax.profiler trace of sampling")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--reos_raw", action="store_true",
                   help="dump the raw per-molecule REOS flag matrix")
    p.add_argument("--devices", type=int, default=1,
                   help="shard each sampling batch over the first N devices "
                        "(data-parallel mesh)")
    p.add_argument("--bucketed", action="store_true",
                   help="use per-size-bucket batches instead of the default "
                        "multi-molecule row packing (packing turns the "
                        "fragmented histogram draw into 1-2 large dispatches;"
                        " trajectory output always uses the bucketed path)")
    return p.parse_args()


def write_xyz(mols, path):
    """Plain XYZ trajectory output (always available, unlike SDF/RDKit)."""
    with open(path, "w") as f:
        for mol in mols:
            f.write(f"{mol.num_atoms}\n\n")
            for sym, pos in zip(mol.atom_types, mol.positions):
                f.write(f"{sym} {pos[0]:.4f} {pos[1]:.4f} {pos[2]:.4f}\n")


def write_sdf(mols, path):
    from rdkit import Chem
    w = Chem.SDWriter(str(path))
    for mol in mols:
        if mol.rdkit_mol is not None:
            w.write(mol.rdkit_mol)
    w.close()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from flowmol_tpu.analysis.metrics import SampleAnalyzer
    from flowmol_tpu.analysis.molecule_builder import (
        HAVE_RDKIT, molecules_from_sampled_state)
    from flowmol_tpu.api import load_pretrained, load_run, resolve_data_dir

    if args.model_dir is not None:
        pm = load_run(args.model_dir, step=args.checkpoint)
    elif args.model_name is not None:
        pm = load_pretrained(args.model_name)
    else:
        raise SystemExit("must specify --model_dir or --model_name")

    model, params = pm.model, pm.params
    rng = np.random.default_rng(args.seed)

    visualize = args.xt_traj or args.ep_traj

    from flowmol_tpu.api import bucketed_sample

    # sample size-bucketed padded batches (padding waste is quadratic in the
    # pairwise compute); chunks respect max_batch_size (test.py:99-133)
    if args.n_atoms_per_mol is not None:
        sizes = np.full(args.n_mols, args.n_atoms_per_mol)
    else:
        sizes = pm.n_atoms_dist.sample(rng, args.n_mols)
    all_mols = []
    if args.profile:
        jax.profiler.start_trace(str(args.profile))
    t0 = time.time()
    mesh = None
    if args.devices > 1:
        from flowmol_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.devices)
    use_packed = not (args.bucketed or visualize)
    if use_packed:
        from flowmol_tpu.analysis.molecule_builder import SampledMolecule
        from flowmol_tpu.api import packed_sample
        states = packed_sample(
            model, params, sizes, seed=args.seed,
            n_timesteps=args.n_timesteps,
            max_batch_size=args.max_batch_size, mesh=mesh,
            stochasticity=args.stochasticity,
            high_confidence_threshold=args.hc_thresh, dfm_type=args.dfm_type,
            simplex_project=args.simplex_project)
        all_mols = [SampledMolecule(
            st["x"], st["a"], st["c"], st["e"], model.cfg.atom_type_map,
            ctmc_mol=model.cfg.discrete_cats,
            fake_atoms=model.cfg.fake_atom_p > 0,
            explicit_aromaticity=model.cfg.explicit_aromaticity)
            for st in states]
        batches = []
    else:
        batches = bucketed_sample(
            model, params, sizes, seed=args.seed,
            n_timesteps=args.n_timesteps,
            max_batch_size=args.max_batch_size, visualize=visualize,
            mesh=mesh, stochasticity=args.stochasticity,
            high_confidence_threshold=args.hc_thresh, dfm_type=args.dfm_type,
            simplex_project=args.simplex_project)
    mol_counter = 0
    for final, node_mask, traj in batches:
        all_mols.extend(molecules_from_sampled_state(
            final, node_mask, model.cfg.atom_type_map,
            ctmc_mol=model.cfg.discrete_cats,
            fake_atoms=model.cfg.fake_atom_p > 0,
            explicit_aromaticity=model.cfg.explicit_aromaticity))
        if visualize:
            from flowmol_tpu.analysis.molecule_builder import (
                trajectory_sdf, trajectory_xyz_frames)
            args.traj_dir.mkdir(parents=True, exist_ok=True)
            for m in range(node_mask.shape[0]):
                for ep, flag in ((False, args.xt_traj), (True, args.ep_traj)):
                    if not flag:
                        continue
                    frames = trajectory_xyz_frames(
                        traj, m, node_mask, model.cfg.atom_type_map,
                        endpoint=ep, fake_atoms=model.cfg.fake_atom_p > 0,
                        ctmc_mol=model.cfg.discrete_cats)
                    tag = "ep" if ep else "xt"
                    fn = args.traj_dir / f"mol_{mol_counter + m}_{tag}.xyz"
                    fn.write_text("\n".join(frames) + "\n")
                    # bonded trajectory (reference parity: per-step molecules
                    # with bonds, written as SDF — test.py:224-259)
                    sdf = trajectory_sdf(
                        traj, m, node_mask, model.cfg.atom_type_map,
                        endpoint=ep, fake_atoms=model.cfg.fake_atom_p > 0,
                        ctmc_mol=model.cfg.discrete_cats)
                    (args.traj_dir /
                     f"mol_{mol_counter + m}_{tag}.sdf").write_text(sdf)
        mol_counter += node_mask.shape[0]
    sampling_time = time.time() - t0
    if args.profile:
        jax.profiler.stop_trace()
        print(f"profile trace -> {args.profile}")
    print(f"sampled {len(all_mols)} molecules in {sampling_time:.2f}s "
          f"({len(all_mols) / sampling_time:.2f} mols/s)")

    if args.output_file is not None:
        out = args.output_file
        out.parent.mkdir(parents=True, exist_ok=True)
        if args.baseline_comparison:
            with open(out, "wb") as f:
                pickle.dump({"rdkit_mols": [m.rdkit_mol for m in all_mols],
                             "sampling_time": sampling_time}, f)
        elif out.suffix == ".sdf" and HAVE_RDKIT:
            write_sdf(all_mols, out)
        else:
            write_xyz(all_mols, out.with_suffix(".xyz"))
        print(f"wrote samples -> {out}")

    if args.metrics:
        data_dir = resolve_data_dir(
            pm.config["dataset"]["processed_data_dir"])
        analyzer = SampleAnalyzer(processed_data_dir=data_dir)

        if args.n_subsets > 1:
            # 95% CI over subsets (test.py:158-181)
            subsets = np.array_split(np.arange(len(all_mols)), args.n_subsets)
            per_subset = [analyzer.analyze([all_mols[i] for i in idx],
                                           functional_validity=True)
                          for idx in subsets]
            metrics = {}
            for k in per_subset[0]:
                vals = np.array([m[k] for m in per_subset])
                metrics[k] = float(vals.mean())
                metrics[f"{k}_ci"] = float(1.96 * vals.std(ddof=1)
                                           / np.sqrt(len(vals)))
        else:
            metrics = analyzer.analyze(all_mols, functional_validity=True)
        metrics["sampling_time"] = sampling_time
        metrics["mols_per_sec"] = len(all_mols) / sampling_time
        print(json.dumps(metrics, indent=2, default=float))
        if args.metrics_file:
            with open(args.metrics_file, "w") as f:
                json.dump(metrics, f, indent=2, default=float)

        if args.reos_raw:
            # raw per-molecule REOS flag matrix + ring counts (reference
            # test.py:201-206); gated on useful_rdkit_utils/rdkit
            import pickle
            raw = analyzer.reos_and_rings(all_mols, return_raw=True)
            if "reos_flag_arr" in raw:
                base = args.output_file or Path("samples.out")
                raw_file = base.parent / f"{base.stem}_reos_and_rings.pkl"
                raw_file.parent.mkdir(parents=True, exist_ok=True)
                with open(raw_file, "wb") as f:
                    pickle.dump(raw, f)
                print(f"wrote REOS raw data -> {raw_file}")
            else:
                print("--reos_raw: REOS unavailable "
                      "(needs rdkit + useful_rdkit_utils)")


if __name__ == "__main__":
    main()
