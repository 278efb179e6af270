"""The pairwise message stack as pure functions over explicit weights.

Two interchangeable compute paths for GVPConv's message+aggregate phase
(the innermost hot loop, SURVEY.md §3.1):

  * `xla_message_agg` — the reference semantics in plain XLA ops (identical
    math to the PairGVP + GVPChain module path);
  * `pallas_message_agg` — a fused Pallas TPU kernel that tiles over
    (dst-block, src-block) pairs, keeps every per-pair intermediate in VMEM,
    and accumulates the masked aggregation on-chip, so no (B, N, N, ·)
    tensor is ever written to HBM.

Both consume the same weight pytree (built by GVPConv via `init_weights`)
so they are freely switchable at trace time.  Covers the flowmol3-class
configuration: no attention, no compressed messaging; optional
destination-node features and cross-product features are supported.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flowmol_tpu.nn.embedding import norm_no_nan, rbf
from flowmol_tpu.parallel.pairshard import constrain_pairs


@dataclasses.dataclass(frozen=True)
class MessageStackSpec:
    """Static shape spec of the message GVP stack."""

    s_msg: int              # node scalar dim entering messages
    v_msg: int              # node vector dim entering messages
    s_dst: int              # dst-feat scalar dim (0 = off)
    v_dst: int              # dst-feat vector dim (0 = off)
    rbf_dim: int
    rbf_dmax: float
    edge_feat_dim: int
    n_cp_feats: int
    # per-layer (v_in, v_out, s_in, s_out); layer 0's v_in/s_in refer to the
    # concatenated pair inputs
    dims: Tuple[Tuple[int, int, int, int], ...]
    message_norm: object = "sum"   # 'sum' | 'mean' | float

    @property
    def h0(self) -> int:
        v_in0 = 1 + self.v_msg + self.v_dst
        return max(v_in0, self.dims[0][1])


def init_weights(module, spec: MessageStackSpec, torch_uniform) -> Dict:
    """Create the explicit parameter tree on a flax module (call from within
    @nn.compact)."""
    w: Dict[str, jnp.ndarray] = {}
    v_in0 = 1 + spec.v_msg + spec.v_dst
    h0 = spec.h0
    ncp = spec.n_cp_feats
    _, v0_out, _, s0_out = spec.dims[0]

    w["wh0"] = module.param("msg0_Wh", torch_uniform, (v_in0, h0))
    if ncp:
        w["wcp0"] = module.param("msg0_Wcp", torch_uniform, (v_in0, 2 * ncp))
    w["wu0"] = module.param("msg0_Wu", torch_uniform, (h0 + ncp, v0_out))
    w["k_src"] = module.param("msg0_K_src", torch_uniform,
                              (spec.s_msg, s0_out))
    w["k_edge"] = module.param("msg0_K_edge", torch_uniform,
                               (spec.rbf_dim + spec.edge_feat_dim, s0_out))
    if spec.s_dst:
        w["k_dst"] = module.param("msg0_K_dst", torch_uniform,
                                  (spec.s_dst, s0_out))
    w["k_sh"] = module.param("msg0_K_sh", torch_uniform, (h0 + ncp, s0_out))
    w["b0"] = module.param("msg0_bias", jax.nn.initializers.zeros, (s0_out,))
    w["g0"] = module.param("msg0_gate", torch_uniform, (s0_out, v0_out))
    w["gb0"] = module.param("msg0_gate_bias", jax.nn.initializers.zeros,
                            (v0_out,))

    for li, (v_in, v_out, s_in, s_out) in enumerate(spec.dims[1:], start=1):
        h = max(v_in, v_out)
        w[f"wh{li}"] = module.param(f"msg{li}_Wh", torch_uniform, (v_in, h))
        if ncp:
            w[f"wcp{li}"] = module.param(f"msg{li}_Wcp", torch_uniform,
                                         (v_in, 2 * ncp))
        w[f"wu{li}"] = module.param(f"msg{li}_Wu", torch_uniform,
                                    (h + ncp, v_out))
        w[f"k{li}"] = module.param(f"msg{li}_K", torch_uniform,
                                   (s_in + h + ncp, s_out))
        w[f"b{li}"] = module.param(f"msg{li}_bias", jax.nn.initializers.zeros,
                                   (s_out,))
        w[f"g{li}"] = module.param(f"msg{li}_gate", torch_uniform,
                                   (s_out, v_out))
        w[f"gb{li}"] = module.param(f"msg{li}_gate_bias",
                                    jax.nn.initializers.zeros, (v_out,))
    return w


# --------------------------------------------------------------------------- #
# shared math pieces
# --------------------------------------------------------------------------- #

def _gvp_layer(w, li, ncp, s, v, dt):
    """One standard GVP over per-pair state (s: (..., s_in), v: (..., v_in, 3))."""
    vh = jnp.einsum("...vc,vh->...hc", v, w[f"wh{li}"].astype(dt))
    if ncp:
        vcp = jnp.einsum("...vc,vp->...pc", v, w[f"wcp{li}"].astype(dt))
        a, b = jnp.split(vcp, 2, axis=-2)
        vh = jnp.concatenate([vh, jnp.cross(a, b)], axis=-2)
    vu = jnp.einsum("...hc,hu->...uc", vh, w[f"wu{li}"].astype(dt))
    sh = norm_no_nan(vh.astype(jnp.float32), axis=-1).astype(dt)
    y = jnp.concatenate([s, sh], -1) @ w[f"k{li}"].astype(dt) + \
        w[f"b{li}"].astype(dt)
    s_out = jax.nn.silu(y)
    gate = s_out @ w[f"g{li}"].astype(dt) + w[f"gb{li}"].astype(dt)
    v_out = jax.nn.sigmoid(gate).astype(dt)[..., None] * vu
    return s_out, v_out


def _layer0(w, spec, dt, sc, s_dst, vc, v_dst, x_diff, d_ef):
    """Factored layer 0 (PairGVP math): node matmuls per node, broadcast-add."""
    ncp = spec.n_cp_feats
    wh = w["wh0"].astype(dt)
    wh_x, wh_src = wh[0], wh[1:1 + spec.v_msg]
    vh = jnp.einsum("bijc,h->bijhc", x_diff, wh_x)
    vh = vh + jnp.einsum("bnvc,vh->bnhc", vc, wh_src)[:, None]
    if spec.v_dst:
        vh = vh + jnp.einsum("bnvc,vh->bnhc", v_dst,
                             wh[1 + spec.v_msg:])[:, :, None]
    if ncp:
        wcp = w["wcp0"].astype(dt)
        vcp = jnp.einsum("bijc,p->bijpc", x_diff, wcp[0])
        vcp = vcp + jnp.einsum("bnvc,vp->bnpc", vc,
                               wcp[1:1 + spec.v_msg])[:, None]
        if spec.v_dst:
            vcp = vcp + jnp.einsum("bnvc,vp->bnpc", v_dst,
                                   wcp[1 + spec.v_msg:])[:, :, None]
        a, b = jnp.split(vcp, 2, axis=-2)
        vh = jnp.concatenate([vh, jnp.cross(a, b)], axis=-2)

    vu = jnp.einsum("bijhc,hu->bijuc", vh, w["wu0"].astype(dt))
    sh = norm_no_nan(vh.astype(jnp.float32), axis=-1).astype(dt)

    y = jnp.einsum("bijd,do->bijo", d_ef, w["k_edge"].astype(dt))
    y = y + jnp.einsum("bijh,ho->bijo", sh, w["k_sh"].astype(dt))
    y = y + jnp.einsum("bnd,do->bno", sc, w["k_src"].astype(dt))[:, None]
    if spec.s_dst:
        y = y + jnp.einsum("bnd,do->bno", s_dst,
                           w["k_dst"].astype(dt))[:, :, None]
    s0 = jax.nn.silu(y + w["b0"].astype(dt))
    gate = s0 @ w["g0"].astype(dt) + w["gb0"].astype(dt)
    v0 = jax.nn.sigmoid(gate).astype(dt)[..., None] * vu
    return s0, v0


# --------------------------------------------------------------------------- #
# flat (component-blocked) layout path
#
# TPU tiles the minor-most two dims of every materialized tensor to (8, 128)
# (sublanes, lanes).  A pair vector tensor shaped (B, N, N, V, 3) therefore
# physically occupies ~42x its logical bytes (3 -> 128 lanes), which makes the
# message stack HBM-bound at ~2% of the logical-byte roofline.  The flat path
# stores every pair vector tensor as (B, N, N, 3V) in component-blocked order
# [x-block | y-block | z-block], so the minor dim is >= 96 and pads <= 2x:
#   * channel mixing  v @ W        ->  v_flat @ kron(I3, W)
#   * cross products                ->  per-component block slices
#   * vector norms over components  ->  sum of squared blocks
#   * vector gating                 ->  gate tiled 3x along the flat dim
# Identical math (same products, f32 accumulation on the MXU), ~20x less
# physical HBM traffic on the (B,N,N,·,3) intermediates.
# --------------------------------------------------------------------------- #

def _kron3(w):
    """(a, b) -> (3a, 3b) block-diagonal: flat channel mix in blocked layout."""
    return jnp.kron(jnp.eye(3, dtype=w.dtype), w)


def _to_flat(v):
    """(..., V, 3) -> (..., 3V) component-blocked."""
    return jnp.swapaxes(v, -1, -2).reshape(*v.shape[:-2], 3 * v.shape[-2])


def _from_flat(vf):
    """(..., 3V) component-blocked -> (..., V, 3)."""
    p = vf.shape[-1] // 3
    return jnp.moveaxis(vf.reshape(*vf.shape[:-1], 3, p), -2, -1)


def _blk(t, p, lo, hi):
    """Select channels [lo, hi) from each component block of t (..., 3p)."""
    return jnp.concatenate([t[..., c * p + lo: c * p + hi] for c in range(3)],
                           axis=-1)


def _cross_flat(a, b, p):
    """Cross product per channel; a, b (..., 3p) blocked -> (..., 3p)."""
    ax, ay, az = a[..., :p], a[..., p:2 * p], a[..., 2 * p:]
    bx, by, bz = b[..., :p], b[..., p:2 * p], b[..., 2 * p:]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1)


def _cat_blocks(t1, p1, t2, p2):
    """Concat channels per component: (..., 3p1) + (..., 3p2) -> (..., 3(p1+p2))."""
    parts = []
    for c in range(3):
        parts.append(t1[..., c * p1:(c + 1) * p1])
        parts.append(t2[..., c * p2:(c + 1) * p2])
    return jnp.concatenate(parts, axis=-1)


def _block_norm(vf, p, eps=1e-8):
    """norm_no_nan over components in blocked layout; vf (..., 3p) -> (..., p)."""
    sq = jnp.square(vf.astype(jnp.float32))
    s2 = sq[..., :p] + sq[..., p:2 * p] + sq[..., 2 * p:]
    return jnp.sqrt(jnp.maximum(s2, eps))


def _tile3(g):
    return jnp.concatenate([g, g, g], axis=-1)


def _gvp_layer_flat(w, li, ncp, s, vf, dt):
    """One GVP over per-pair state; vf (..., 3*v_in) component-blocked."""
    wh = w[f"wh{li}"].astype(dt)
    h = wh.shape[1]
    vh = vf @ _kron3(wh)
    if ncp:
        vcp = vf @ _kron3(w[f"wcp{li}"].astype(dt))
        a = _blk(vcp, 2 * ncp, 0, ncp)
        b = _blk(vcp, 2 * ncp, ncp, 2 * ncp)
        vh = _cat_blocks(vh, h, _cross_flat(a, b, ncp), ncp)
    vu = vh @ _kron3(w[f"wu{li}"].astype(dt))
    sh = _block_norm(vh, h + ncp).astype(dt)
    y = jnp.concatenate([s, sh], -1) @ w[f"k{li}"].astype(dt) + \
        w[f"b{li}"].astype(dt)
    s_out = jax.nn.silu(y)
    gate = s_out @ w[f"g{li}"].astype(dt) + w[f"gb{li}"].astype(dt)
    v_out = _tile3(jax.nn.sigmoid(gate).astype(dt)) * vu
    return s_out, v_out


def _layer0_flat(w, spec, dt, sc, s_dst, vcf, v_dstf, x_diff, d_ef):
    """Factored layer 0 in blocked layout (same math as `_layer0`)."""
    ncp = spec.n_cp_feats
    wh = w["wh0"].astype(dt)
    h0 = wh.shape[1]
    wh_x, wh_src = wh[0], wh[1:1 + spec.v_msg]
    vh = x_diff @ _kron3(wh_x[None, :])                   # (B,N,N,3h0)
    vh = vh + (vcf @ _kron3(wh_src))[:, None]
    if spec.v_dst:
        vh = vh + (v_dstf @ _kron3(wh[1 + spec.v_msg:]))[:, :, None]
    if ncp:
        wcp = w["wcp0"].astype(dt)
        vcp = x_diff @ _kron3(wcp[0][None, :])
        vcp = vcp + (vcf @ _kron3(wcp[1:1 + spec.v_msg]))[:, None]
        if spec.v_dst:
            vcp = vcp + (v_dstf @ _kron3(wcp[1 + spec.v_msg:]))[:, :, None]
        a = _blk(vcp, 2 * ncp, 0, ncp)
        b = _blk(vcp, 2 * ncp, ncp, 2 * ncp)
        vh = _cat_blocks(vh, h0, _cross_flat(a, b, ncp), ncp)

    vu = vh @ _kron3(w["wu0"].astype(dt))
    sh = _block_norm(vh, h0 + ncp).astype(dt)

    y = jnp.einsum("bijd,do->bijo", d_ef, w["k_edge"].astype(dt))
    y = y + jnp.einsum("bijh,ho->bijo", sh, w["k_sh"].astype(dt))
    y = y + jnp.einsum("bnd,do->bno", sc, w["k_src"].astype(dt))[:, None]
    if spec.s_dst:
        y = y + jnp.einsum("bnd,do->bno", s_dst,
                           w["k_dst"].astype(dt))[:, :, None]
    s0 = jax.nn.silu(y + w["b0"].astype(dt))
    gate = s0 @ w["g0"].astype(dt) + w["gb0"].astype(dt)
    v0 = _tile3(jax.nn.sigmoid(gate).astype(dt)) * vu
    return s0, v0


def xla_message_agg_flat(w: Dict, spec: MessageStackSpec, sc, s_dst, vc, v_dst,
                         x, ef, pair_mask, dtype=None):
    """Message stack + masked aggregation with flat pair-vector layout.

    Same weights / same math as `xla_message_agg`; all (B,N,N,·,3) pair
    intermediates are kept as (B,N,N,3·) component-blocked tensors instead.
    """
    dt = dtype or sc.dtype
    diff = x[:, None, :, :] - x[:, :, None, :]
    dij = norm_no_nan(diff, axis=-1, keepdims=True) + 1e-8
    x_diff = constrain_pairs((diff / dij).astype(dt))
    d = rbf(dij[..., 0], d_max=spec.rbf_dmax, d_count=spec.rbf_dim)
    d_ef = constrain_pairs(
        (jnp.concatenate([d, ef], -1) if spec.edge_feat_dim else d).astype(dt))

    vcf = _to_flat(vc.astype(dt))
    v_dstf = _to_flat(v_dst.astype(dt)) if spec.v_dst else None
    s, v = _layer0_flat(w, spec, dt, sc.astype(dt),
                        None if not spec.s_dst else s_dst.astype(dt),
                        vcf, v_dstf, x_diff, d_ef)
    for li in range(1, len(spec.dims)):
        s, v = _gvp_layer_flat(w, li, spec.n_cp_feats, s, v, dt)

    pmf = pair_mask[..., None].astype(s.dtype)
    agg_s = jnp.sum(s * pmf, axis=2, dtype=jnp.float32)
    agg_vf = jnp.sum(v * pmf, axis=2, dtype=jnp.float32)
    agg_v = _from_flat(agg_vf)
    if spec.message_norm == "mean":
        cnt = jnp.maximum(jnp.sum(pmf, axis=2, dtype=jnp.float32), 1.0)
        agg_s, agg_v = agg_s / cnt, agg_v / cnt[..., None]
    elif spec.message_norm != "sum":
        z = float(spec.message_norm)
        agg_s, agg_v = agg_s / z, agg_v / z
    return agg_s, agg_v


def xla_message_agg(w: Dict, spec: MessageStackSpec, sc, s_dst, vc, v_dst,
                    x, ef, pair_mask, dtype=None):
    """Reference-semantics message stack + masked aggregation in plain XLA."""
    dt = dtype or sc.dtype
    diff = x[:, None, :, :] - x[:, :, None, :]
    dij = norm_no_nan(diff, axis=-1, keepdims=True) + 1e-8
    x_diff = constrain_pairs((diff / dij).astype(dt))
    d = rbf(dij[..., 0], d_max=spec.rbf_dmax, d_count=spec.rbf_dim)
    d_ef = constrain_pairs(
        (jnp.concatenate([d, ef], -1) if spec.edge_feat_dim else d).astype(dt))

    s, v = _layer0(w, spec, dt, sc.astype(dt),
                   None if not spec.s_dst else s_dst.astype(dt),
                   vc.astype(dt),
                   None if not spec.v_dst else v_dst.astype(dt),
                   x_diff, d_ef)
    for li in range(1, len(spec.dims)):
        s, v = _gvp_layer(w, li, spec.n_cp_feats, s, v, dt)

    pmf = pair_mask[..., None].astype(s.dtype)
    agg_s = jnp.sum(s * pmf, axis=2, dtype=jnp.float32)
    agg_v = jnp.sum(v * pmf[..., None], axis=2, dtype=jnp.float32)
    if spec.message_norm == "mean":
        cnt = jnp.maximum(jnp.sum(pmf, axis=2, dtype=jnp.float32), 1.0)
        agg_s, agg_v = agg_s / cnt, agg_v / cnt[..., None]
    elif spec.message_norm != "sum":
        z = float(spec.message_norm)
        agg_s, agg_v = agg_s / z, agg_v / z
    return agg_s, agg_v
