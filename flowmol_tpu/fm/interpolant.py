"""Interpolant schedules alpha_t per feature — pure, vectorized.

Parity target: /root/reference/flowmol/models/interpolant_scheduler.py
(`alpha_t`:97-112, `alpha_t_prime`:114-128, `cosine_alpha_t`:131-146,
`interpolant_weights`:72-85, `loss_weights`:87-95).

The reference builds a per-feature schedule at runtime with Python loops;
here the whole schedule is a static config resolved into vectorized jnp math.
Feature order is always the canonical ('x', 'a', 'c', 'e').
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from flowmol_tpu.graphs import CANONICAL_FEAT_ORDER


@dataclasses.dataclass(frozen=True)
class InterpolantSchedule:
    """Static per-feature schedule spec.

    schedule_types: tuple of 'linear' | 'cosine' per canonical feature.
    nus: cosine sharpness parameter per feature (ignored for linear).
    """

    schedule_types: Tuple[str, ...] = ("linear",) * 4
    nus: Tuple[float, ...] = (1.0,) * 4
    clamp_t: bool = True

    def __post_init__(self):
        for st in self.schedule_types:
            if st not in ("linear", "cosine"):
                raise ValueError(f"unsupported schedule_type: {st}")
        if len(self.schedule_types) != len(CANONICAL_FEAT_ORDER):
            raise ValueError("need one schedule per canonical feature")

    @classmethod
    def from_config(cls, cfg: Optional[dict]) -> "InterpolantSchedule":
        """Build from the reference's YAML `interpolant_scheduler` section.

        Accepts `schedule_type` as a string (applied to all feats) or a dict
        keyed by feature, plus optional `cosine_params` dict of nu values.
        """
        cfg = cfg or {}
        st = cfg.get("schedule_type") or "cosine"
        cosine_params = cfg.get("cosine_params") or {}
        if isinstance(st, str):
            st_dict = {f: st for f in CANONICAL_FEAT_ORDER}
        else:
            st_dict = st
        types, nus = [], []
        for f in CANONICAL_FEAT_ORDER:
            ft = st_dict.get(f)
            if ft is None:
                raise ValueError(f"must specify schedule_type for feature {f}")
            types.append(ft)
            if ft == "cosine" and f not in cosine_params:
                raise ValueError(f"must specify cosine_params for feature {f}")
            nus.append(float(cosine_params.get(f, 1.0)))
        return cls(schedule_types=tuple(types), nus=tuple(nus))

    def _is_cosine(self) -> jnp.ndarray:
        return jnp.array([st == "cosine" for st in self.schedule_types])

    def alpha_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """t (...,) -> alpha (..., 4) in canonical feature order."""
        t1 = t[..., None]
        nu = jnp.array(self.nus)
        cos_a = 1.0 - jnp.square(jnp.cos(jnp.pi * 0.5 * jnp.power(t1, nu)))
        lin_a = jnp.broadcast_to(t1, cos_a.shape)
        return jnp.where(self._is_cosine(), cos_a, lin_a)

    def alpha_t_prime(self, t: jnp.ndarray) -> jnp.ndarray:
        """d(alpha)/dt, shape (..., 4)."""
        if self.clamp_t:
            t = jnp.maximum(t, 1e-9)
        t1 = t[..., None]
        nu = jnp.array(self.nus)
        cos_p = jnp.pi * 0.5 * jnp.sin(jnp.pi * jnp.power(t1, nu)) * nu * jnp.power(t1, nu - 1.0)
        lin_p = jnp.ones_like(cos_p)
        return jnp.where(self._is_cosine(), cos_p, lin_p)

    def interpolant_weights(self, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (weight of x_0, weight of x_1) = (1 - alpha, alpha)."""
        a = self.alpha_t(t)
        return 1.0 - a, a

    def loss_weights(self, t: jnp.ndarray) -> jnp.ndarray:
        """Time-dependent loss weights clamp(alpha/(1-alpha), 0.05, 1.5)."""
        a = self.alpha_t(t)
        return jnp.clip(a / (1.0 - a), 0.05, 1.5)


FEAT_INDEX: Dict[str, int] = {f: i for i, f in enumerate(CANONICAL_FEAT_ORDER)}
