"""Sinusoidal time embeddings and RBF distance expansions.

Behavioural parity targets: /root/reference/flowmol/utils/embedding.py
(`get_time_embedding`:5-17, `_rbf`:19-34, `rbf_twoscale`:36-57).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def time_embedding(t: jnp.ndarray, embedding_dim: int = 256,
                   max_positions: int = 1000) -> jnp.ndarray:
    """Sinusoidal embedding of t in [0,1]. t: (B,) -> (B, embedding_dim)."""
    ts = t * max_positions
    half = embedding_dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(max_positions) / (half - 1))
    )
    ang = ts.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def rbf(d: jnp.ndarray, d_min: float = 0.0, d_max: float = 20.0,
        d_count: int = 16) -> jnp.ndarray:
    """Gaussian RBF expansion along a new trailing axis: (...,) -> (..., d_count)."""
    mu = jnp.linspace(d_min, d_max, d_count)
    sigma = (d_max - d_min) / d_count
    z = (d[..., None] - mu) / sigma
    return jnp.exp(-z * z)


def rbf_twoscale(d: jnp.ndarray, d_min: float = 0.0, d_max: float = 10.0,
                 d_count: int = 32, dividing_point: float = 3.5,
                 high_res_frac: float = 0.6) -> jnp.ndarray:
    """Two-resolution RBF: dense centers below `dividing_point`, sparse above."""
    n_hi = int(d_count * high_res_frac)
    n_lo = d_count - n_hi
    sig_hi = (dividing_point - d_min) / n_hi
    sig_lo = (d_max - dividing_point) / n_lo
    mu_hi = jnp.linspace(d_min, dividing_point, n_hi)
    mu_lo = jnp.linspace(dividing_point, d_max, n_lo)[1:]
    out = []
    for mu, sig in ((mu_hi, sig_hi), (mu_lo, sig_lo)):
        z = (d[..., None] - mu) / sig
        out.append(jnp.exp(-z * z))
    return jnp.concatenate(out, axis=-1)


def norm_no_nan(x: jnp.ndarray, axis: int = -1, keepdims: bool = False,
                eps: float = 1e-8, sqrt: bool = True) -> jnp.ndarray:
    """L2 norm clamped below by eps (pre-sqrt), NaN-safe under autodiff.

    Matches the reference's `_norm_no_nan`
    (/root/reference/flowmol/models/gvp.py:14-21): clamp the *squared* sum at
    eps, then sqrt.
    """
    sq = jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims), eps)
    return jnp.sqrt(sq) if sqrt else sq
