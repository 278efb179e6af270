"""Dirichlet conditional flows (FlowMol1), device-resident.

Parity targets:
  * `DirichletConditionalFlow` (/root/reference/flowmol/utils/dirflow.py:7-33):
    beta-CDF derivative tables for the conditional-flow c_factor;
  * `DirichletVectorField.step` (vector_field.py:700-803).

TPU design deltas:
  * the reference evaluates c_factor with scipy on the CPU *inside the
    sampling loop* (vector_field.py:739-744 does a GPU->CPU->GPU round trip
    every step); here the betainc-derivative table is precomputed once on the
    host and lives on device — the per-step lookup is a gather + lerp inside
    the jitted scan;
  * the reference's O(K^2) "conditional vector field per endpoint" loop
    collapses analytically: sum_k p_k (e_k - x) c = c * (p - x) since
    sum_k p_k = 1 — computed elementwise.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from scipy import special as sps
except Exception:  # pragma: no cover
    sps = None


@dataclasses.dataclass(frozen=True)
class DirichletConditionalFlow:
    """Precomputed c_factor tables for one categorical dimension K."""

    K: int
    alpha_min: float
    alpha_spacing: float
    alphas: np.ndarray          # (A,)
    bs: np.ndarray              # (NB,) uniform grid on [0, 1]
    deriv: np.ndarray           # (A-1, NB) d(betainc)/d(alpha)

    @classmethod
    def build(cls, K: int, alpha_min: float = 0.0, alpha_max: float = 34.0,
              alpha_spacing: float = 0.1, n_bs: int = 512
              ) -> "DirichletConditionalFlow":
        """Build the d(betainc)/d(alpha) table.

        Table size matters beyond memory: the table is embedded in the
        compiled sampler as an HLO constant, and the round-4 defaults
        (0.01 spacing x 1000 b-points = 13.6 MB per modality) blew the
        remote-compile payload up to a measured 17-MINUTE compile for a tiny
        dirichlet sampler shape.  The compact default (0.1 x 512 = 0.7 MB)
        with BILINEAR interpolation in `c_factor` (the old table used
        nearest-alpha rows) has comparable accuracy: nearest at h=0.01 errs
        ~(h/2)·f' while bilinear at h=0.1 errs ~(h^2/8)·f''."""
        if sps is None:
            raise RuntimeError("scipy required to build Dirichlet flow tables")
        alphas = np.arange(alpha_min, alpha_max + alpha_spacing, alpha_spacing)
        bs = np.linspace(0.0, 1.0, n_bs)
        cdfs = np.stack([sps.betainc(max(a, 1e-6), K - 1, bs) for a in alphas])
        deriv = np.diff(cdfs, axis=0) / alpha_spacing
        return cls(K=K, alpha_min=float(alpha_min),
                   alpha_spacing=float(alpha_spacing), alphas=alphas, bs=bs,
                   deriv=np.nan_to_num(deriv).astype(np.float32))

    def c_factor(self, b: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
        """c_factor for simplex coordinates b (any shape) at scalar alpha.

        jax-traced equivalent of dirflow.py:18-33 (including the
        small-denominator zeroing and NaN rescue at vector_field.py:745-748).
        """
        k = self.K
        # beta(alpha, K-1) via lgamma
        log_beta = (jax.lax.lgamma(jnp.maximum(alpha, 1e-6)) +
                    jax.lax.lgamma(jnp.asarray(float(k - 1))) -
                    jax.lax.lgamma(alpha + k - 1))
        out1 = jnp.exp(log_beta)

        denom1 = jnp.power(1.0 - b, k - 1)
        out2 = jnp.where(jnp.abs(denom1) > 1e-8, out1 / denom1, 0.0)
        denom2 = jnp.power(b, alpha - 1.0)
        out = jnp.where(jnp.abs(denom2) > 1e-8, out2 / denom2, 0.0)

        # bilinear over the derivative table: rows live at alpha midpoints
        # m_i = alpha_min + (i + 0.5) * h (forward differences), interpolate
        # linearly between the two bracketing rows (scalar-index gathers)
        deriv = jnp.asarray(self.deriv)
        pos_a = (alpha - self.alpha_min) / self.alpha_spacing - 0.5
        a0 = jnp.clip(jnp.floor(pos_a).astype(jnp.int32), 0,
                      deriv.shape[0] - 2)
        fa = jnp.clip(pos_a - a0, 0.0, 1.0)
        row = deriv[a0] * (1.0 - fa) + deriv[a0 + 1] * fa

        # linear interpolation over the uniform b grid
        nb = self.bs.shape[0]
        pos = jnp.clip(b, 0.0, 1.0) * (nb - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, nb - 2)
        frac = pos - i0
        interp = -(row[i0] * (1.0 - frac) + row[i0 + 1] * frac)

        return jnp.nan_to_num(interp * out)


def dirichlet_marginal_step(flow: DirichletConditionalFlow, x_t: jnp.ndarray,
                            p1: jnp.ndarray, w_t: jnp.ndarray,
                            w_s: jnp.ndarray) -> jnp.ndarray:
    """One marginal-vector-field integration step on the simplex.

    x_t, p1: (..., K); w_t, w_s: scalars (w = alpha * w_max + 1).
    marginal vf = c_factor(x_t, w_t) * (p1 - x_t); Euler step by (w_s - w_t),
    then always-project onto the simplex (projection is identity for points
    already inside, so this matches the reference's conditional projection,
    vector_field.py:805-811).
    """
    from flowmol_tpu.data.priors import simplex_proj
    c = flow.c_factor(x_t, w_t)
    x_s = x_t + c * (p1 - x_t) * (w_s - w_t)
    return simplex_proj(x_s)
