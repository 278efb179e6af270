"""Prior distributions and OT prior coupling.

Parity target: /root/reference/flowmol/data_processing/priors.py
(prior registry 244-264, centered-normal 19-35, simplex priors 50-68,
marginal / c-given-a 70-99, CTMC masked prior 101-107, OT coupling
`align_prior` 109-126, Kabsch `rigid_alignment` 128-169).

Two families:
  * device-side jax samplers used inside the jitted sample path (padded
    batches, explicit PRNG keys);
  * host-side numpy/scipy coupling (Hungarian + Kabsch) used in the input
    pipeline workers, exactly where the reference runs it
    (dataset.py:168-183) — this is host CPU work, not device compute.

Plus a vmappable jax Kabsch (`batched_rigid_align`) that fixes what the
reference's broken `batched_rigid_alignment` (priors.py:171-240) attempted.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flowmol_tpu.graphs import masked_mean_nodes

try:
    from scipy.optimize import linear_sum_assignment
except Exception:  # pragma: no cover
    linear_sum_assignment = None


# --------------------------------------------------------------------------- #
# device-side samplers (padded batch shapes)
# --------------------------------------------------------------------------- #

def centered_normal(rng, shape_bn3, node_mask, std: float = 1.0) -> jnp.ndarray:
    """Zero-CoM Gaussian positions per molecule. shape (B, N, 3)."""
    x = jax.random.normal(rng, shape_bn3) * std
    com = masked_mean_nodes(x, node_mask)
    x = x - com[:, None, :]
    return x * node_mask[..., None]


def gaussian_simplex(rng, shape, std: float = 1.0,
                     simplex_center: bool = False) -> jnp.ndarray:
    p = jax.random.normal(rng, shape) * std
    if simplex_center:
        p = p + 1.0 / shape[-1]
    return p


def barycenter(rng, shape, blur: float = 0.0) -> jnp.ndarray:
    p = jnp.full(shape, 1.0 / shape[-1])
    if blur != 0.0:
        p = p + jax.random.normal(rng, shape) * blur
        p = simplex_proj(p)
    return p


def uniform_simplex(rng, shape) -> jnp.ndarray:
    e = jax.random.exponential(rng, shape)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def biased_simplex(rng, shape, vertex_prob: float = 0.75, std: float = 0.2,
                   vertex_idx: int = 0) -> jnp.ndarray:
    d = shape[-1]
    non_zero = (1.0 - vertex_prob) / (d - 1)
    mu = jnp.full((d,), non_zero).at[vertex_idx].set(vertex_prob)
    s = mu + jax.random.normal(rng, shape) * std
    return jax.nn.softmax(s * d, axis=-1)


def marginal(rng, shape, p: jnp.ndarray, blur: Optional[float] = None) -> jnp.ndarray:
    d = shape[-1]
    idx = jax.random.categorical(rng, jnp.log(p), shape=shape[:-1])
    oh = jax.nn.one_hot(idx, d)
    if blur is not None:
        oh = oh + jax.random.normal(rng, oh.shape) * blur
        oh = jax.nn.softmax(oh * d, axis=-1)
    return oh


def c_given_a(rng, shape, atom_types: jnp.ndarray, p_c_given_a: jnp.ndarray,
              blur: Optional[float] = None) -> jnp.ndarray:
    a_idx = jnp.argmax(atom_types, axis=-1)
    logits = jnp.log(jnp.maximum(p_c_given_a[a_idx], 1e-30))
    idx = jax.random.categorical(rng, logits)
    oh = jax.nn.one_hot(idx, shape[-1])
    if blur is not None:
        oh = oh + jax.random.normal(rng, oh.shape) * blur
        oh = jax.nn.softmax(oh * shape[-1], axis=-1)
    return oh


def ctmc_masked(shape_no_k, n_real_classes: int) -> jnp.ndarray:
    """All-mask-token one-hot prior: (..., K+1) with the last column hot."""
    out = jnp.zeros(shape_no_k + (n_real_classes + 1,))
    return out.at[..., -1].set(1.0)


def simplex_proj(seq: jnp.ndarray) -> jnp.ndarray:
    """Euclidean projection onto the probability simplex (algorithm of Held
    et al.; parity with flowmol/utils/dirflow.py:35-50), over the last axis."""
    k = seq.shape[-1]
    u = jnp.flip(jnp.sort(seq, axis=-1), axis=-1)
    cssv = jnp.cumsum(u, axis=-1)
    ar = jnp.arange(1, k + 1)
    cond = u * ar > (cssv - 1.0)
    rho = jnp.sum(cond, axis=-1)
    theta = (jnp.take_along_axis(cssv, rho[..., None] - 1, axis=-1) - 1.0) / rho[..., None]
    return jnp.maximum(seq - theta, 0.0)


# --------------------------------------------------------------------------- #
# Kabsch rigid alignment
# --------------------------------------------------------------------------- #

def rigid_align(x0: jnp.ndarray, x1: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Rotate+translate x0 onto x1 (Kabsch).  x0, x1: (N, 3); mask: (N,).

    jax-native, differentiable, vmappable over a batch axis — the working
    replacement for the reference's broken `batched_rigid_alignment`.
    """
    if mask is None:
        mask = jnp.ones(x0.shape[0], bool)
    m = mask[:, None].astype(x0.dtype)
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mu0 = jnp.sum(x0 * m, 0) / cnt
    mu1 = jnp.sum(x1 * m, 0) / cnt
    a = (x0 - mu0) * m
    b = (x1 - mu1) * m
    h = a.T @ b
    u, _, vt = jnp.linalg.svd(h, full_matrices=False)
    # proper rotation (det +1)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    s = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    r = vt.T @ s @ u.T
    aligned = (x0 - mu0) @ r.T + mu1
    return jnp.where(mask[:, None], aligned, x0)


batched_rigid_align = jax.vmap(rigid_align, in_axes=(0, 0, 0))


# --------------------------------------------------------------------------- #
# host-side OT coupling (input pipeline)
# --------------------------------------------------------------------------- #

def np_rigid_align(x0: np.ndarray, x1: np.ndarray) -> np.ndarray:
    """Host Kabsch: rotate/translate x0 onto x1 (matches priors.py:128-169).

    Note: like the reference, uses R = V U^T without the det correction (a
    reflection can slip through; harmless for prior coupling but we keep the
    reference behaviour on the host path for parity)."""
    mu0 = x0.mean(0, keepdims=True)
    mu1 = x1.mean(0, keepdims=True)
    a = x0 - mu0
    b = x1 - mu1
    h = a.T @ b
    u, _, vt = np.linalg.svd(h)
    r = vt.T @ u.T
    return a @ r.T + mu1


def align_prior_np(prior: np.ndarray, dst: np.ndarray, permutation: bool = True,
                   rigid_body: bool = False, n_alignments: int = 1,
                   use_native: bool = True) -> np.ndarray:
    """Hungarian permutation alignment + optional Kabsch (priors.py:109-126).

    Uses the native C++ implementation (flowmol_tpu.ops.ot_native) when the
    toolchain is available; scipy otherwise."""
    native = None
    if use_native:
        try:
            from flowmol_tpu.ops import ot_native
            native = ot_native if ot_native.available() else None
        except Exception:
            native = None
    for _ in range(n_alignments):
        if permutation:
            cost = np.linalg.norm(dst[:, None, :] - prior[None, :, :], axis=-1)
            if native is not None:
                prior_idx = native.hungarian(cost)
            else:
                if linear_sum_assignment is None:
                    raise RuntimeError(
                        "scipy required for OT permutation alignment")
                _, prior_idx = linear_sum_assignment(cost)
            prior = prior[prior_idx]
        if rigid_body:
            prior = (native.kabsch(prior, dst).astype(prior.dtype)
                     if native is not None else np_rigid_align(prior, dst))
    return prior


# host-side samplers for the input pipeline (numpy; per single molecule)

def np_sample_prior_feat(rng: np.random.Generator, prior_type: str, n: int,
                         d: int, kwargs: dict,
                         atom_types: Optional[np.ndarray] = None) -> np.ndarray:
    """Sample one molecule's prior feature on the host (train pipeline)."""
    if prior_type == "centered-normal":
        x = rng.standard_normal((n, d)).astype(np.float32) * kwargs.get("std", 4.0)
        return x - x.mean(0, keepdims=True)
    if prior_type == "gaussian":
        x = rng.standard_normal((n, d)).astype(np.float32) * kwargs.get("std", 1.0)
        if kwargs.get("simplex_center"):
            x = x + 1.0 / d
        return x
    if prior_type == "ctmc":
        out = np.zeros((n, d + 1), np.float32)
        out[:, -1] = 1.0
        return out
    if prior_type == "barycenter":
        p = np.full((n, d), 1.0 / d, np.float32)
        blur = kwargs.get("blur", 0.0)
        if blur:
            p = p + rng.standard_normal((n, d)).astype(np.float32) * blur
            p = np.asarray(simplex_proj(jnp.asarray(p)))
        return p
    if prior_type == "uniform-simplex":
        e = rng.exponential(1.0, (n, d)).astype(np.float32)
        return e / e.sum(-1, keepdims=True)
    if prior_type == "biased-simplex":
        vertex_prob = kwargs.get("vertex_prob", 0.75)
        std = kwargs.get("std", 0.2)
        vertex_idx = kwargs.get("vertex_idx", 0)
        mu = np.full((d,), (1 - vertex_prob) / (d - 1), np.float32)
        mu[vertex_idx] = vertex_prob
        s = mu + rng.standard_normal((n, d)).astype(np.float32) * std
        s = s * d
        s = s - s.max(-1, keepdims=True)
        e = np.exp(s)
        return e / e.sum(-1, keepdims=True)
    if prior_type == "marginal":
        p = np.asarray(kwargs["p"], np.float64)
        idx = rng.choice(d, size=n, p=p / p.sum())
        return np.eye(d, dtype=np.float32)[idx]
    if prior_type == "c-given-a":
        p_c_given_a = np.asarray(kwargs["p_c_given_a"], np.float64)
        a_idx = atom_types.argmax(-1)
        out = np.zeros((n, d), np.float32)
        for i, ai in enumerate(a_idx):
            row = p_c_given_a[ai]
            out[i, rng.choice(d, p=row / row.sum())] = 1.0
        return out
    raise ValueError(f"unknown prior type {prior_type}")


def coupled_node_prior_np(rng: np.random.Generator,
                          dst: Dict[str, np.ndarray],
                          prior_config: Dict[str, dict]) -> Dict[str, np.ndarray]:
    """Sample node priors with OT coupling for one molecule (host side).

    Parity: priors.py:266-303 — for each node feature, sample the prior, then
    (if `align`) permute via Hungarian and (for x) rigidly align via Kabsch.
    """
    out: Dict[str, np.ndarray] = {}
    for feat in ("x", "a", "c"):
        if feat not in dst:
            continue
        cfg = prior_config[feat]
        # dst features are one-hot WITHOUT a mask column; the ctmc prior
        # returns (n, d+1) with the mask column hot (priors.py:101-107).
        n, d = dst[feat].shape
        prior = np_sample_prior_feat(rng, cfg["type"], n, d,
                                     cfg.get("kwargs", {}) or {},
                                     atom_types=out.get("a"))
        if cfg.get("align"):
            prior = align_prior_np(prior, dst[feat], permutation=True,
                                   rigid_body=(feat == "x"))
        out[feat] = prior.astype(np.float32)
    return out
