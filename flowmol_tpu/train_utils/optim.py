"""Optimizer, manual LR schedule and EMA.

Parity targets:
  * Adam + weight_decay (flowmol.py:451-459) — torch Adam's `weight_decay`
    adds wd*param to the gradient *before* the moment updates, which is
    optax.add_decayed_weights placed before scale_by_adam;
  * manual per-step LR with warmup + linear/cosine restarts
    (/root/reference/flowmol/models/lr_scheduler.py:43-70), driven by
    `epoch_exact = epoch + batch_idx / batches_per_epoch`;
  * EMA of parameters (/root/reference/flowmol/utils/ema.py — torch_ema).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class LRScheduleConfig:
    base_lr: float = 1e-4
    weight_decay: float = 0.0
    warmup_length: float = 0.0      # epochs
    restart_interval: float = 0.0   # epochs; 0 = no restarts
    restart_type: Optional[str] = "linear"  # 'linear' | 'cosine'

    @classmethod
    def from_config(cls, cfg: dict) -> "LRScheduleConfig":
        cfg = cfg or {}
        return cls(base_lr=float(cfg.get("base_lr", 1e-4)),
                   weight_decay=float(cfg.get("weight_decay", 0.0) or 0.0),
                   warmup_length=float(cfg.get("warmup_length", 0.0) or 0.0),
                   restart_interval=float(cfg.get("restart_interval", 0.0) or 0.0),
                   restart_type=cfg.get("restart_type", "linear"))


def lr_at(cfg: LRScheduleConfig, epoch_exact) -> jnp.ndarray:
    """LR as a pure function of epoch_exact (works traced or concrete).

    Matches LRScheduler.step_lr semantics: linear warmup to base_lr over
    `warmup_length` epochs, then (optionally) restarts every
    `restart_interval` epochs with a linear or cosine decay inside each
    interval.  The reference mutates a `restart_marker`; with warmup-aligned
    fixed intervals this reduces to modular arithmetic.
    """
    e = jnp.asarray(epoch_exact, jnp.float32)
    base = jnp.asarray(cfg.base_lr, jnp.float32)

    if cfg.warmup_length > 0:
        warm = base * e / cfg.warmup_length
    else:
        warm = base

    if cfg.restart_interval > 0:
        into = jnp.mod(jnp.maximum(e - cfg.warmup_length, 0.0),
                       cfg.restart_interval)
        if cfg.restart_type == "cosine":
            after = 0.5 * base * (1 + jnp.cos(into * jnp.pi / cfg.restart_interval))
        elif cfg.restart_type == "linear":
            after = base * (1.0 - into / cfg.restart_interval)
        else:
            raise NotImplementedError(cfg.restart_type)
    else:
        after = base

    if cfg.warmup_length > 0:
        return jnp.where(e <= cfg.warmup_length, warm, after)
    return after


def make_optimizer(cfg: LRScheduleConfig) -> optax.GradientTransformation:
    """Adam with torch-style weight decay and an injected learning rate.

    Only the LR is injected (overwritten per step via `set_lr`); weight decay
    is a static config value.
    """
    wd = cfg.weight_decay

    def factory(lr):
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        chain.append(optax.scale(-lr))
        return optax.chain(*chain)

    return optax.inject_hyperparams(factory)(lr=cfg.base_lr)


def set_lr(opt_state, lr):
    """Overwrite the injected lr hyperparameter in the optimizer state."""
    opt_state.hyperparams["lr"] = lr
    return opt_state


# ------------------------------------------------------------------------- #
# EMA
# ------------------------------------------------------------------------- #

def ema_init(params):
    return jax.tree.map(lambda p: p, params)


def ema_update(ema, params, decay: float, num_updates=None):
    """EMA with torch_ema warmup semantics (the reference wraps torch_ema,
    utils/ema.py): effective decay = min(decay, (1 + n) / (10 + n)) where n
    counts prior EMA updates — early updates track the raw params closely
    instead of being anchored to the random init."""
    if num_updates is not None:
        n = jnp.asarray(num_updates, jnp.float32)
        decay = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, params)
