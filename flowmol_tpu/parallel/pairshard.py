"""Edge-axis (pair) sharding context for the O(N^2) message tensors.

The network's hot tensors are dense pairwise blocks of shape
(B, N_dst, N_src, ...) — for large molecules (GEOM tops out at 181 atoms,
padded bucket 192) these dominate both HBM footprint and FLOPs.  On a 2-D
``('data', 'edge')`` device mesh the *destination-row* axis of every pair
tensor is sharded over ``'edge'``: each chip computes messages for its slice
of destination rows, the masked source-axis reduction stays chip-local, and
GSPMD inserts the node-feature all-gathers over ICI automatically.  This is
the TPU-native sequence-parallel analogue of sharding edges across GPUs —
the reference has no equivalent (its DGL batches are replicated per rank,
flowmol/utils/adaptive_sampler.py).

Mechanism: a contextvar carries the pair ``NamedSharding`` while a wrapped
function is *traced* (see ``mesh.jit_sample_fn_2d``); the network calls
:func:`constrain_pairs` at every pair-tensor creation point, which is the
identity when no context is active — zero overhead on the 1-D path.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax

_PAIR_SHARDING: contextvars.ContextVar[Optional["jax.sharding.Sharding"]] = \
    contextvars.ContextVar("pair_sharding", default=None)


@contextlib.contextmanager
def pair_sharding(sharding):
    """Activate `sharding` (over the leading (B, N_dst) dims) for every pair
    tensor created while tracing under this context."""
    token = _PAIR_SHARDING.set(sharding)
    try:
        yield
    finally:
        _PAIR_SHARDING.reset(token)


def constrain_pairs(t):
    """Apply the active pair sharding to `t` ((B, N_dst, N_src, ...) layout,
    rank >= 2); identity when no pair-sharding context is active."""
    sh = _PAIR_SHARDING.get()
    if sh is None or t is None:
        return t
    return jax.lax.with_sharding_constraint(t, sh)
