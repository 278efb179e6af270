#!/usr/bin/env python
"""Training entry point.

Parity target: /root/reference/train.py — config-vs-resume resolution,
seeding, run-dir + config persistence, checkpointing/EMA, `--debug` capping.
TPU-native: one jitted (optionally pjit data-parallel) train step; metrics to
JSONL (+wandb if available).

Usage:
    python train.py --config=configs/dev.yml
    python train.py --resume runs/dev_run            # resume a run dir
    python train.py --config=... --debug             # 100-step smoke run
"""

import argparse
import shutil
import time
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train a FlowMol-TPU model")
    p.add_argument("--config", type=Path, help="YAML config file")
    p.add_argument("--resume", type=Path, help="run dir to resume from")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--debug", action="store_true",
                   help="cap training at 100 steps, no wandb")
    p.add_argument("--run_name", type=str, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--profile", type=Path, default=None,
                   help="capture a jax.profiler trace of the first ~20 steps "
                        "into this directory")
    p.add_argument("--seed-model", dest="seed_model", type=Path, default=None,
                   help="initialize parameters from another run's checkpoint "
                        "(parity: train.py --seed-model, load.py:27-37)")
    # hyperparameter sweep overrides (subset of sweep_config.py:4-51)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--lr", type=float)
    p.add_argument("--warmup_length", type=float)
    p.add_argument("--max_num_edges", type=int)
    p.add_argument("--x_loss_weight", type=float)
    p.add_argument("--a_loss_weight", type=float)
    p.add_argument("--c_loss_weight", type=float)
    p.add_argument("--e_loss_weight", type=float)
    p.add_argument("--distort_p", type=float)
    p.add_argument("--fake_atom_p", type=float)
    p.add_argument("--scprop", type=float)
    p.add_argument("--n_hidden_scalars", type=int)
    p.add_argument("--n_vec_channels", type=int)
    p.add_argument("--n_molecule_updates", type=int)
    p.add_argument("--n_hidden_edge_feats", type=int)
    p.add_argument("--convs_per_update", type=int)
    p.add_argument("--n_cp_feats", type=int)
    p.add_argument("--time_scaled_loss", type=int)
    p.add_argument("--target_blur", type=float)
    p.add_argument("--weight_ae", type=int)
    p.add_argument("--stochasticity", type=float)
    p.add_argument("--high_confidence_threshold", type=float)
    p.add_argument("--x_nu", type=float, help="cosine schedule nu for x")
    p.add_argument("--a_nu", type=float)
    p.add_argument("--c_nu", type=float)
    p.add_argument("--e_nu", type=float)
    p.add_argument("--ema_decay", type=float)
    p.add_argument("--weight_decay", type=float)
    p.add_argument("--restart_interval", type=float)
    p.add_argument("--restart_type", type=str)
    p.add_argument("--prior_x_std", type=float)
    p.add_argument("--self_conditioning", type=int)
    p.add_argument("--scprop_override", type=float)
    return p.parse_args()


def merge_config_and_args(config: dict, args) -> dict:
    """CLI sweep overrides merged into the config dict
    (parity: sweep_config.py:54-129)."""
    if args.lr is not None:
        config.setdefault("lr_scheduler", {})["base_lr"] = args.lr
    if args.warmup_length is not None:
        config["lr_scheduler"]["warmup_length"] = args.warmup_length
    if args.max_num_edges is not None:
        config.setdefault("training", {})["max_num_edges"] = args.max_num_edges
    if args.batch_size is not None:
        config.setdefault("training", {})["batch_size"] = args.batch_size
    if args.max_epochs is not None:
        config.setdefault("training", {}).setdefault(
            "trainer_args", {})["max_epochs"] = args.max_epochs
    mol_fm = config.setdefault("mol_fm", {})
    tlw = mol_fm.setdefault("total_loss_weights", {})
    for feat in "xace":
        v = getattr(args, f"{feat}_loss_weight")
        if v is not None:
            tlw[feat] = v
    for k in ("distort_p", "fake_atom_p"):
        v = getattr(args, k)
        if v is not None:
            mol_fm[k] = v
    if args.ema_decay is not None:
        config.setdefault("training", {})["ema_decay"] = args.ema_decay
    for k in ("weight_decay", "restart_interval", "restart_type"):
        v = getattr(args, k)
        if v is not None:
            config.setdefault("lr_scheduler", {})[k] = v
    for k in ("time_scaled_loss", "target_blur", "weight_ae"):
        v = getattr(args, k)
        if v is not None:
            mol_fm[k] = bool(v) if k != "target_blur" else v
    if args.prior_x_std is not None:
        mol_fm.setdefault("prior_config", {}).setdefault(
            "x", {"align": True, "type": "centered-normal", "kwargs": {}}
        ).setdefault("kwargs", {})["std"] = args.prior_x_std
    vf = config.setdefault("vector_field", {})
    for k in ("scprop", "n_hidden_scalars", "n_vec_channels",
              "n_molecule_updates", "n_hidden_edge_feats", "convs_per_update",
              "n_cp_feats", "stochasticity", "high_confidence_threshold"):
        v = getattr(args, k)
        if v is not None:
            vf[k] = v
    if args.self_conditioning is not None:
        vf["self_conditioning"] = bool(args.self_conditioning)
    if args.scprop_override is not None:
        vf["scprop"] = args.scprop_override
    # per-feature cosine schedule overrides
    nus = {f: getattr(args, f"{f}_nu") for f in "xace"}
    if any(v is not None for v in nus.values()):
        isc = config.setdefault("interpolant_scheduler", {})
        st = isc.get("schedule_type")
        if not isinstance(st, dict):
            st = {f: (st or "linear") for f in "xace"}
        cp = isc.setdefault("cosine_params", {})
        for f, v in nus.items():
            if v is not None:
                st[f] = "cosine"
                cp[f] = v
        isc["schedule_type"] = st
    return config


def main():
    args = parse_args()
    if args.config is None and args.resume is None:
        raise SystemExit("must specify --config or --resume")

    from flowmol_tpu.api import (data_module_from_config, lr_config_from_config,
                                 model_from_config, n_atoms_dist_from_config,
                                 read_config_file, resolve_data_dir)
    from flowmol_tpu.train_utils.checkpoint import (MetricsLogger, load_config,
                                                    save_config)
    from flowmol_tpu.train_utils.loop import Trainer

    resume = False
    if args.resume is not None:
        run_dir = Path(args.resume)
        config = load_config(run_dir)
        # CLI overrides apply on resume too (reference semantics: the sweep
        # flags win over the stored config) — in particular --max_epochs,
        # without which a finished run silently resumes as a no-op
        config = merge_config_and_args(config, args)
        save_config(run_dir, config)
        resume = True
    else:
        config = read_config_file(args.config)
        out_root = Path(config.get("training", {}).get("output_dir", "runs"))
        name = args.run_name or config.get("wandb", {}).get("name") or "run"
        run_dir = out_root / f"{name.replace(' ', '_')}_{int(time.time())}"
        run_dir.mkdir(parents=True, exist_ok=True)
        config = merge_config_and_args(config, args)
        save_config(run_dir, config)

    np.random.seed(args.seed)

    # multi-host pods: initialize the jax distributed runtime when a
    # coordinator is configured (TPU-native counterpart of Lightning's
    # num_nodes, configs/flowmol3.yml:11); each host then loads its
    # contiguous dataset fraction (adaptive_sampler.py:22-29 parity)
    import os
    n_hosts = 1
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax
        jax.distributed.initialize()
        n_hosts = jax.process_count()
        print(f"distributed: host {jax.process_index()}/{n_hosts}")

    model = model_from_config(config)
    # multi-host: every host iterates the IDENTICAL batch schedule (same
    # seed, no per-rank batcher sharding) so the pjit'd programs and
    # collectives match across processes; each host then contributes its
    # row slice of every global batch (mesh.shard_global_batch).  Batch
    # sizes must divide the data-mesh size (and hence the host count).
    n_mesh_devices = int(config.get("training", {}).get(
        "trainer_args", {}).get("devices", 1) or 1)
    divisible_by = max(n_hosts, n_mesh_devices if n_mesh_devices > 1 else 1)
    data = data_module_from_config(config, divisible_by=divisible_by)
    train_cfg = config.get("training", {})
    trainer_args = train_cfg.get("trainer_args", {}) or {}
    eval_cfg = train_cfg.get("evaluation", {}) or {}

    wandb_mode = config.get("wandb", {}).get("mode", "disabled")
    use_wandb = (wandb_mode in ("online", "offline")) and not args.debug
    logger = MetricsLogger(run_dir, use_wandb=use_wandb,
                           wandb_config={**config.get("wandb", {}),
                                         "full_config": config})

    trainer = Trainer(
        model, data, run_dir,
        lr_cfg=lr_config_from_config(config),
        max_epochs=int(trainer_args.get("max_epochs", 1)),
        ema_decay=float(train_cfg.get("ema_decay", 0.0) or 0.0),
        sample_interval=float(eval_cfg.get("sample_interval", 0) or 0),
        n_mols_to_sample=int(eval_cfg.get("mols_to_sample", 64)),
        val_loss_interval=float(eval_cfg.get("val_loss_interval", 0) or 0),
        limit_val_batches=trainer_args.get("limit_val_batches"),
        n_atoms_dist=n_atoms_dist_from_config(config),
        processed_data_dir=resolve_data_dir(
            config["dataset"]["processed_data_dir"]),
        use_mesh=int(trainer_args.get("devices", 1)) > 1,
        monitor=config.get("checkpointing", {}).get("monitor"),
        max_to_keep=int(config.get("checkpointing", {}).get("save_top_k", 6)),
        seed=args.seed,
        logger=logger,
        max_steps=args.max_steps or (100 if args.debug else None),
    )

    if resume:
        trainer.try_resume()
    elif args.seed_model is not None:
        # initialize parameters from a foreign checkpoint (--seed-model)
        from flowmol_tpu.api import load_run
        seeded = load_run(args.seed_model)
        import dataclasses as _dc
        trainer.state.params = seeded.params
        if trainer.state.ema is not None:
            trainer.state.ema = seeded.params
        print(f"seeded parameters from {args.seed_model}")

    print(f"training -> {run_dir}")
    if args.profile:
        import jax
        jax.profiler.start_trace(str(args.profile))
        try:
            trainer.max_steps = min(trainer.max_steps or 20, 20)
            trainer.fit()
        finally:
            jax.profiler.stop_trace()
            print(f"profile trace -> {args.profile}")
    else:
        trainer.fit()
    logger.close()


if __name__ == "__main__":
    main()
