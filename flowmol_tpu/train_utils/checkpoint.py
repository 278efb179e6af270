"""Checkpointing with orbax, keeping the reference's run-dir contract:

    <run_dir>/config.yaml
    <run_dir>/checkpoints/<step>/...   (+ 'last' tracking)

Parity: Lightning ModelCheckpoint + save_hyperparameters round-trip
(/root/reference/train.py:118-125, flowmol.py:169, trained_models/readme.md).
Hyperparameters live in config.yaml; `load_run` reconstructs the model
without the original config file location.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml


def save_config(run_dir, config: Dict):
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    with open(run_dir / "config.yaml", "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def load_config(run_dir) -> Dict:
    with open(Path(run_dir) / "config.yaml") as f:
        return yaml.safe_load(f)


class CheckpointManager:
    """max_to_keep latest checkpoints; optionally keep the best-k by a
    monitored metric (the reference's ModelCheckpoint save_top_k /
    monitor=val_total_loss, configs/flowmol3.yml:45-49)."""

    def __init__(self, run_dir, max_to_keep: int = 6,
                 monitor: Optional[str] = None, mode: str = "min"):
        self.run_dir = Path(run_dir)
        self.ckpt_dir = (self.run_dir / "checkpoints").resolve()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        # async barrier timeout raised from orbax's 600 s default: a
        # training SIGSTOPped through a benchmark window
        # (tools/pause_runs.sh) longer than the timeout would otherwise
        # crash with "Timeout waiting for key ... item_directory_creation"
        # on resume (observed round 5)
        opts = dict(max_to_keep=max_to_keep, create=True,
                    async_options=ocp.options.AsyncOptions(timeout_secs=7200))
        if monitor:
            opts["best_fn"] = lambda m: m.get(monitor, float("inf"))
            opts["best_mode"] = mode
        self.monitor = monitor
        self.mngr = ocp.CheckpointManager(
            self.ckpt_dir, options=ocp.CheckpointManagerOptions(**opts))

    def save(self, step: int, state, extra: Optional[Dict[str, Any]] = None,
             metrics: Optional[Dict[str, float]] = None):
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        kw = {}
        if self.monitor:
            kw["metrics"] = {k: float(v) for k, v in (metrics or {}).items()}
        self.mngr.save(step, args=ocp.args.StandardSave(payload), **kw)
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, step: Optional[int] = None, template=None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if template is not None:
            payload = {"state": template[0]}
            if template[1] is not None:
                payload["extra"] = template[1]
            restored = self.mngr.restore(
                step, args=ocp.args.StandardRestore(payload))
        else:
            restored = self.mngr.restore(step)
        return step, restored


class MetricsLogger:
    """JSONL metrics log (+ optional wandb if installed).  Replaces the
    reference's hard wandb dependency (train.py:101)."""

    def __init__(self, run_dir, use_wandb: bool = False,
                 wandb_config: Optional[Dict] = None):
        self.path = Path(run_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                cfg = wandb_config or {}
                self.wandb = wandb
                wandb.init(project=cfg.get("project", "flowmol-tpu"),
                           group=cfg.get("group"), name=cfg.get("name"),
                           config=cfg.get("full_config"))
            except Exception:
                self.wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        row = {}
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = float(np.asarray(v))
            row[k] = v
        if step is not None:
            row["step"] = step
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def close(self):
        self._f.close()
        if self.wandb is not None:
            self.wandb.finish()
