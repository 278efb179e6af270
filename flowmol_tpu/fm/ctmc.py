"""CTMC discrete flows (FlowMol2/3), vectorized over padded batches.

Behavioural parity targets:
  * masked-token conditional path: ctmc_vector_field.py:97-143
  * campbell step:                 ctmc_vector_field.py:414-461
  * gat step:                      ctmc_vector_field.py:463-510
  * purity sampling:               flowmol/utils/ctmc_utils.py:4-35
  * temperature / forward-weight schedules: ctmc_vector_field.py:71-95

TPU design deltas: all functions are pure (explicit PRNG keys), shapes are
static, categorical entities are flattened to (B, M) slabs (M = nodes, or the
N(N-1)/2 upper-triangle edges extracted with static indices), and the
per-graph reductions of the reference's `segment_csr` become plain masked
sums over axis 1 — no scatter ops anywhere.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# dense <-> upper-triangle slab conversion (static index tables)
# --------------------------------------------------------------------------- #

def upper_tri_indices(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (i, j) index arrays of the strict upper triangle, in the same
    row-major order the reference uses (`torch.triu_indices`)."""
    return np.triu_indices(n, k=1)


def edges_to_upper(e: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, N, N, ...) -> (B, M, ...) gathering the upper triangle."""
    iu, ju = upper_tri_indices(n)
    return e[:, iu, ju]


from functools import lru_cache


@lru_cache(maxsize=None)
def _pair_index_tables(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static inverse map pair_index[i,j] = upper-list position of {i,j}
    (both triangles), plus an off-diagonal mask."""
    iu, ju = upper_tri_indices(n)
    pair_idx = np.zeros((n, n), np.int32)
    k = np.arange(iu.shape[0], dtype=np.int32)
    pair_idx[iu, ju] = k
    pair_idx[ju, iu] = k
    return pair_idx, ~np.eye(n, dtype=bool)


def upper_to_dense(vals: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, M, ...) -> symmetric (B, N, N, ...) with zero diagonal.

    Implemented as a GATHER through a static (N, N) index table instead of
    two scatter-updates: this runs once per scan step on (B, N, N, K)
    tensors, and TPU gathers lower far better than scatters."""
    pair_idx, offdiag = _pair_index_tables(n)
    out = vals[:, pair_idx]  # (B, N, N, ...)
    mask = jnp.asarray(offdiag).reshape((1, n, n) + (1,) * (vals.ndim - 2))
    return jnp.where(mask, out, jnp.zeros((), vals.dtype))


def upper_valid_mask(node_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, N) -> (B, M) validity of each upper-triangle edge.

    Accepts a bool validity mask or an int graph-id mask (packed rows, see
    flowmol_tpu.graphs.is_graph_ids): under packing an edge is valid only
    when both endpoints belong to the same molecule.
    """
    n = node_mask.shape[1]
    iu, ju = upper_tri_indices(n)
    if jnp.issubdtype(node_mask.dtype, jnp.integer):
        gi, gj = node_mask[:, iu], node_mask[:, ju]
        return (gi == gj) & (gi >= 0)
    return node_mask[:, iu] & node_mask[:, ju]


def upper_segment_ids(node_mask: jnp.ndarray) -> jnp.ndarray:
    """Graph-id per upper-triangle edge; -1 for invalid (padding or
    cross-molecule) edges.  `node_mask` must be an int graph-id mask."""
    n = node_mask.shape[1]
    iu, ju = upper_tri_indices(n)
    gi, gj = node_mask[:, iu], node_mask[:, ju]
    return jnp.where((gi == gj) & (gi >= 0), gi, -1)


# --------------------------------------------------------------------------- #
# schedules
# --------------------------------------------------------------------------- #

def cat_temperature(t, schedule="decay", decay_max: float = 0.8,
                    decay_a: float = 2.0):
    """Categorical softmax temperature schedule (ctmc_vector_field.py:71-82)."""
    if schedule == "decay":
        return decay_max * jnp.power(1.0 - t, decay_a)
    if callable(schedule):
        return schedule(t)
    return jnp.asarray(float(schedule))


def forward_weight(t, schedule="beta", beta_a: float = 0.25,
                   beta_b: float = 0.25, beta_max: float = 10.0):
    """Forward-weight schedule for the 'gat' step (ctmc_vector_field.py:84-95)."""
    if schedule == "beta":
        return 1.0 + beta_max * jnp.power(t, beta_a) * jnp.power(1.0 - t, beta_b)
    if callable(schedule):
        return schedule(t)
    return jnp.asarray(float(schedule))


# --------------------------------------------------------------------------- #
# conditional path (training)
# --------------------------------------------------------------------------- #

def mask_tokens(rng, x1_tokens: jnp.ndarray, alpha: jnp.ndarray,
                mask_index: int) -> jnp.ndarray:
    """Independently replace each token by the mask token with prob 1 - alpha.

    x1_tokens: (B, M) int; alpha: (B,) per-graph alpha_t for this feature.
    """
    u = jax.random.uniform(rng, x1_tokens.shape)
    return jnp.where(u < 1.0 - alpha[:, None], mask_index, x1_tokens)


# --------------------------------------------------------------------------- #
# purity sampling
# --------------------------------------------------------------------------- #

def purity_probs(xt: jnp.ndarray, x1_probs: jnp.ndarray,
                 unmask_prob: jnp.ndarray, mask_index: int,
                 valid_mask: jnp.ndarray, hc_thresh: float,
                 segment_ids: Optional[jnp.ndarray] = None,
                 n_segments: Optional[int] = None) -> jnp.ndarray:
    """Per-element unmasking probabilities for purity sampling.

    xt: (B, M) tokens; x1_probs: (B, M, K); valid_mask: (B, M) bool.
    Per-graph counts are masked sums over axis 1 (the reference used
    torch_scatter.segment_csr).

    With packed rows (several molecules per row), `segment_ids` (B, M) gives
    each element's molecule id within its row (-1 = not a molecule element)
    and `n_segments` the static max molecules per row; the budget math then
    runs per molecule through a one-hot segment matmul.
    """
    masked = (xt == mask_index) & valid_mask
    purities = jnp.max(x1_probs, axis=-1)
    hc = (purities >= hc_thresh) & masked
    lc = (purities < hc_thresh) & masked

    if segment_ids is not None:
        # one_hot(-1) is the all-zero row, so invalid elements drop out
        seg = jax.nn.one_hot(segment_ids, n_segments, dtype=jnp.float32)
        per = lambda m: jnp.einsum("bm,bmg->bg", m.astype(jnp.float32), seg)
        back = lambda g: jnp.einsum("bg,bmg->bm", g, seg)
    else:
        per = lambda m: jnp.sum(m, axis=1, keepdims=True).astype(jnp.float32)
        back = lambda g: g  # broadcast (B, 1) against (B, M)

    hc_per_graph = per(hc)
    masked_per_graph = per(masked)

    budget = unmask_prob * masked_per_graph
    ph_max = jnp.where(hc_per_graph > 0, budget / jnp.maximum(hc_per_graph, 1.0),
                       jnp.inf)
    ph = jnp.minimum(ph_max, 1.0)
    lc_per_graph = masked_per_graph - hc_per_graph
    pl = jnp.where(lc_per_graph > 0,
                   (budget - ph * hc_per_graph) / jnp.maximum(lc_per_graph, 1.0),
                   0.0)

    return jnp.where(hc, back(ph), jnp.where(lc, back(pl), 0.0))


def purity_sampling(rng, xt: jnp.ndarray, x1_probs: jnp.ndarray,
                    unmask_prob: jnp.ndarray, mask_index: int,
                    valid_mask: jnp.ndarray, hc_thresh: float,
                    segment_ids: Optional[jnp.ndarray] = None,
                    n_segments: Optional[int] = None) -> jnp.ndarray:
    """Budgeted unmasking preferring high-confidence predictions.

    Returns (B, M) bool `will_unmask`; see `purity_probs` for the budget
    math (split out so tests can check it against a per-molecule oracle).
    """
    prob = purity_probs(xt, x1_probs, unmask_prob, mask_index, valid_mask,
                        hc_thresh, segment_ids=segment_ids,
                        n_segments=n_segments)
    u = jax.random.uniform(rng, xt.shape)
    return (u < prob) & valid_mask


# --------------------------------------------------------------------------- #
# integration steps
# --------------------------------------------------------------------------- #

class CatStepOut(NamedTuple):
    xt: jnp.ndarray          # (B, M) new tokens
    x1_sampled: jnp.ndarray  # (B, M) sampled endpoint tokens


def campbell_step(rng, p1: jnp.ndarray, xt: jnp.ndarray, *,
                  stochasticity: float, hc_thresh: float,
                  alpha_t: jnp.ndarray, alpha_t_prime: jnp.ndarray,
                  dt: jnp.ndarray, mask_index: int,
                  valid_mask: jnp.ndarray, last_step: jnp.ndarray,
                  segment_ids: Optional[jnp.ndarray] = None,
                  n_segments: Optional[int] = None) -> CatStepOut:
    """One Campbell et al. CTMC jump step for a categorical feature.

    p1: (B, M, K) endpoint probabilities over the K real classes (no mask col);
    xt: (B, M) current tokens in [0, K] (K = mask);
    last_step: traced bool — when True, no re-masking happens.
    """
    k_sample, k_unmask, k_mask = jax.random.split(rng, 3)
    x1 = jax.random.categorical(k_sample, jnp.log(jnp.maximum(p1, 1e-30)))

    denom = jnp.maximum(1.0 - alpha_t, 1e-9)
    unmask_prob = jnp.clip(dt * (alpha_t_prime + stochasticity * alpha_t) / denom,
                           0.0, 1.0)
    mask_prob = jnp.clip(dt * stochasticity, 0.0, 1.0)

    if hc_thresh > 0:
        will_unmask = purity_sampling(k_unmask, xt, p1, unmask_prob, mask_index,
                                      valid_mask, hc_thresh,
                                      segment_ids=segment_ids,
                                      n_segments=n_segments)
    else:
        u = jax.random.uniform(k_unmask, xt.shape)
        will_unmask = (u < unmask_prob) & (xt == mask_index) & valid_mask

    u2 = jax.random.uniform(k_mask, xt.shape)
    will_mask = (u2 < mask_prob) & (xt != mask_index) & valid_mask
    will_mask = will_mask & ~last_step  # no re-masking on the final step

    # explicit final unmask: under the reference's schedules unmask_prob
    # clips to 1.0 at the final grid point (ctmc_vector_field.py:430-434),
    # so this is behavior-identical there — but it guarantees no mask token
    # survives sampling under *any* schedule (pathological nu, eta=0, ...)
    will_unmask = will_unmask | (last_step & (xt == mask_index) & valid_mask)

    out = jnp.where(will_mask, mask_index, xt)
    out = jnp.where(will_unmask, x1, out)
    return CatStepOut(xt=out, x1_sampled=x1)


def gat_step(rng, p1: jnp.ndarray, xt: jnp.ndarray, *,
             alpha_t: jnp.ndarray, alpha_t_prime: jnp.ndarray,
             fw: jnp.ndarray, dt: jnp.ndarray, mask_index: int,
             valid_mask: jnp.ndarray) -> CatStepOut:
    """Forward/backward probability-velocity mixture step ('gat').

    p1: (B, M, K) endpoint probs over real classes; a zero mask column is
    appended internally (K+1 classes total).
    """
    n_classes = p1.shape[-1] + 1
    p1_pad = jnp.concatenate([p1, jnp.zeros_like(p1[..., :1])], axis=-1)
    delta_xt = jax.nn.one_hot(xt, n_classes, dtype=p1.dtype)
    delta_mask = jax.nn.one_hot(jnp.full_like(xt, mask_index), n_classes,
                                dtype=p1.dtype)

    denom = jnp.maximum(1.0 - alpha_t, 1e-9)
    u_fwd = alpha_t_prime / denom * (p1_pad - delta_xt)
    u_bwd = alpha_t_prime / (alpha_t + 1e-8) * (delta_xt - delta_mask)
    pvel = fw * u_fwd - (fw - 1.0) * u_bwd
    p_step = jnp.clip(delta_xt + dt * pvel, 1e-9, 1.0)

    x_dt = jax.random.categorical(rng, jnp.log(p_step))
    x_dt = jnp.where(valid_mask, x_dt, xt)
    return CatStepOut(xt=x_dt, x1_sampled=jnp.argmax(p1, axis=-1))


def sharpen(p: jnp.ndarray, temperature: jnp.ndarray) -> jnp.ndarray:
    """softmax(log(p)/T): temperature sharpening of endpoint probabilities
    (ctmc_vector_field.py:354-356)."""
    return jax.nn.softmax(jnp.log(jnp.maximum(p, 1e-30)) / temperature, axis=-1)
