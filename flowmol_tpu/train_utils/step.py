"""The single jitted train step and its data-parallel (pjit) wrapper.

The reference spreads this logic across Lightning hooks
(flowmol.py:227-272 training_step, DDP gradient all-reduce, torch_ema
callback, manual LR stepping).  Here it is one pure function:

    (params, opt_state, ema, batch, rng, epoch_exact)
        -> (params, opt_state, ema, metrics)

jitted over a 1-D `data` mesh: the batch is sharded over devices, parameters
and optimizer state are replicated, and GSPMD inserts the gradient psum over
ICI — the TPU-native equivalent of Lightning DDP + NCCL all-reduce
(SURVEY.md §2.2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from flowmol_tpu.model import FlowMol, TrainBatch
from flowmol_tpu.train_utils.optim import (LRScheduleConfig, ema_init,
                                           ema_update, lr_at, make_optimizer)


class TrainState:
    """Plain container (pytree) for everything a train step mutates."""

    def __init__(self, params, opt_state, ema, step):
        self.params = params
        self.opt_state = opt_state
        self.ema = ema
        self.step = step

    def tree_flatten(self):
        return (self.params, self.opt_state, self.ema, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.ema, s.step), None),
    lambda aux, c: TrainState(*c),
)


def create_train_state(model: FlowMol, rng, lr_cfg: LRScheduleConfig,
                       ema_decay: float = 0.0) -> tuple:
    params = model.init_params(rng)
    tx = make_optimizer(lr_cfg)
    opt_state = tx.init(params)
    ema = ema_init(params) if ema_decay else None
    return TrainState(params, opt_state, ema, jnp.zeros((), jnp.int32)), tx


def make_train_step(model: FlowMol, tx, lr_cfg: LRScheduleConfig,
                    ema_decay: float = 0.0, p_a=None, p_e=None):
    """Build the pure train-step function (not yet jitted)."""

    def train_step(state: TrainState, batch: TrainBatch, rng, epoch_exact):
        def loss(p):
            total, losses = model.loss_fn(p, batch, rng, train=True,
                                          p_a=p_a, p_e=p_e)
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params)

        lr = lr_at(lr_cfg, epoch_exact)
        opt_state = state.opt_state
        opt_state.hyperparams["lr"] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema = (ema_update(state.ema, params, ema_decay,
                          num_updates=state.step)
               if state.ema is not None else None)

        metrics = {f"{k}_train_loss": v for k, v in losses.items()}
        metrics["lr"] = lr
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(params, opt_state, ema, state.step + 1)
        return new_state, metrics

    return train_step


def make_eval_step(model: FlowMol, p_a=None, p_e=None):
    def eval_step(params, batch: TrainBatch, rng):
        total, losses = model.loss_fn(params, batch, rng, train=False,
                                      p_a=p_a, p_e=p_e)
        return {f"{k}_val_loss": v for k, v in losses.items()}

    return eval_step
