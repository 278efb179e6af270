"""Fused Pallas TPU kernel for the pairwise message stack + aggregation.

One grid step computes, for a block of `bi` destination rows of the complete
molecular graph, messages from ALL N sources: pairwise geometry (unit
displacement + RBF), the factored layer-0 GVP, the remaining message GVP
layers, masking, and the masked sum over sources — entirely in VMEM.  No
(B, N, N, ·) intermediate is ever written to HBM (the XLA path materializes
several per layer; see flowmol_tpu/ops/pair_messages.py for the reference
semantics this must match at bf16 tolerance).

Design notes (v2, tuned on v5e):
  * pair index space is flattened to rows: P = bi * N pairs per grid step,
    channels in lanes — every matmul is a plain (rows, K) @ (K, C') MXU op;
  * vector features are *coordinate-stacked*: one (3P, C) tensor whose row
    blocks are the x/y/z coordinates, so per-coordinate channel mixes
    (Wh/Wu/Wcp) run as a single matmul of M = 3P instead of three small ones
    (cross products and norms slice the P-sized row blocks back out —
    static sublane-dim slices);
  * each destination block accumulates over all sources inside the step —
    outputs are written once, no cross-step read-modify-write;
  * state is bf16 end to end; vector norms and the final aggregation
    accumulate in f32.

Covers message_norm in {'sum', const}; no attention / no compressed
messaging (flowmol3-class configs).  Forward-only: used on the sampling
path; training uses the XLA path (same weights).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowmol_tpu.ops.pair_messages import MessageStackSpec


def _zero_idx(nd, b, i):
    return (0,) * nd


def _mm(a, b, dt):
    """Matmul with f32 accumulation (Mosaic requires 32-bit acc for bf16).

    For bf16 operands precision is pinned to DEFAULT: the package-wide
    'highest' matmul precision would request fp32 passes on bf16 operands,
    which Mosaic rejects ("Bad lhs type").  f32 operands (interpret mode /
    f32 compute dtype) keep full precision."""
    prec = (jax.lax.Precision.DEFAULT if a.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=prec).astype(dt)


def _silu(x, dt):
    """SiLU in f32 (Mosaic's bf16 logistic lowering is broken)."""
    x32 = x.astype(jnp.float32)
    return (x32 * jax.nn.sigmoid(x32)).astype(dt)


def _sigmoid(x, dt):
    return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)


def _chunks(t, p):
    """(3P, C) coordinate-stacked -> [x, y, z] of (P, C) via static slices."""
    return [t[c * p:(c + 1) * p] for c in range(3)]


def _cross_stacked(a, b, p):
    """Cross product of two coordinate-stacked (3P, C) tensors -> (3P, C)."""
    a0, a1, a2 = _chunks(a, p)
    b0, b1, b2 = _chunks(b, p)
    return jnp.concatenate([a1 * b2 - a2 * b1,
                            a2 * b0 - a0 * b2,
                            a0 * b1 - a1 * b0], axis=0)


def _norm_stacked(t, p, eps=1e-8):
    """Coordinate-stacked (3P, C) -> (P, C) clamped L2 norm over coords (f32)."""
    c0, c1, c2 = _chunks(t.astype(jnp.float32), p)
    return jnp.sqrt(jnp.maximum(c0 * c0 + c1 * c1 + c2 * c2, eps))


def _rep3(t):
    """(P, C) -> (3P, C): repeat for every coordinate row block."""
    return jnp.concatenate([t, t, t], axis=0)


def _gvp_tail_layer(w, li, ncp, s, v, p, dt):
    """Standard GVP on per-pair state: s (P, S), v (3P, V) coord-stacked."""
    vh = _mm(v, w[f"wh{li}"].astype(dt), dt)
    if ncp:
        vcp = _mm(v, w[f"wcp{li}"].astype(dt), dt)
        cp = _cross_stacked(vcp[:, :ncp], vcp[:, ncp:], p)
        vh = jnp.concatenate([vh, cp], axis=-1)
    vu = _mm(vh, w[f"wu{li}"].astype(dt), dt)
    sh = _norm_stacked(vh, p).astype(dt)
    y = _mm(jnp.concatenate([s, sh], -1), w[f"k{li}"].astype(dt), dt) \
        + w[f"b{li}"].astype(dt)
    s_out = _silu(y, dt)
    gate = _sigmoid(_mm(s_out, w[f"g{li}"].astype(dt), dt)
                    + w[f"gb{li}"].astype(dt), dt)
    return s_out, _rep3(gate) * vu


def _make_kernel(spec: MessageStackSpec, bi: int, n: int, dt, n_layers: int,
                 weight_names):
    ncp = spec.n_cp_feats
    h0 = spec.h0
    has_dst = spec.s_dst > 0
    z = 1.0 if spec.message_norm == "sum" else float(spec.message_norm)
    # rbf centers generated in-kernel via iota (no captured constants)
    rbf_step = spec.rbf_dmax / (spec.rbf_dim - 1)
    rbf_sigma = spec.rbf_dmax / spec.rbf_dim

    def kernel(*refs):
        i_blk = pl.program_id(1)
        it = iter(refs)
        x_i = next(it)[0]          # (BI, 3)
        x_all = next(it)[0]        # (N, 3)
        nm_i = next(it)[0]         # (BI, 1) float
        nm_all = next(it)[0]       # (N, 1) float
        ysrc = next(it)[0]         # (N, S0) f32
        vhs = next(it)[0]          # (3, N, h0) f32 coordinate-major
        if has_dst:
            ydst_i = next(it)[0]   # (BI, S0)
            vhd_i = next(it)[0]    # (3, BI, h0)
        if ncp:
            vcps = next(it)[0]     # (3, N, 2ncp)
            if has_dst:
                vcpd_i = next(it)[0]
        ef = next(it)[0] if spec.edge_feat_dim else None  # (BI, N, De)
        w = {name: next(it)[...] for name in weight_names}
        out_s = next(it)
        out_v = next(it)

        p = bi * n

        def bcast_src(t):  # (N, C) -> (P, C): same source row for every dst
            return jnp.broadcast_to(t[None], (bi,) + t.shape).reshape(
                p, t.shape[-1])

        def bcast_dst(t):  # (BI, C) -> (P, C)
            return jnp.broadcast_to(t[:, None], (bi, n, t.shape[-1])
                                    ).reshape(p, t.shape[-1])

        # ---- geometry (f32) -------------------------------------------------
        diff = bcast_src(x_all) - bcast_dst(x_i)           # (P, 3)
        d2 = jnp.maximum(jnp.sum(diff * diff, -1, keepdims=True), 1e-8)
        dij = jnp.sqrt(d2) + 1e-8                          # (P, 1)
        xdu = diff / dij                                   # unit displacement
        rbf_mu = jax.lax.broadcasted_iota(
            jnp.int32, (1, spec.rbf_dim), 1).astype(jnp.float32) * rbf_step
        d_rbf = jnp.exp(-jnp.square((dij - rbf_mu) / rbf_sigma))

        # ---- layer 0 (factored): vh = xdu*Wh[0] + per-node precomputes -----
        wh0x = w["wh0"][0:1, :].astype(jnp.float32)         # (1, h0)
        parts = []
        for c in range(3):
            vh_c = xdu[:, c:c + 1] * wh0x + bcast_src(vhs[c])
            if has_dst:
                vh_c = vh_c + bcast_dst(vhd_i[c])
            parts.append(vh_c)
        vh = jnp.concatenate(parts, axis=0).astype(dt)      # (3P, h0)
        if ncp:
            wcp0x = w["wcp0"][0:1, :].astype(jnp.float32)   # (1, 2ncp)
            cparts = []
            for c in range(3):
                vcp_c = xdu[:, c:c + 1] * wcp0x + bcast_src(vcps[c])
                if has_dst:
                    vcp_c = vcp_c + bcast_dst(vcpd_i[c])
                cparts.append(vcp_c)
            vcp = jnp.concatenate(cparts, axis=0).astype(dt)  # (3P, 2ncp)
            cp = _cross_stacked(vcp[:, :ncp], vcp[:, ncp:], p)
            vh = jnp.concatenate([vh, cp], axis=-1)           # (3P, h0+ncp)

        vu = _mm(vh, w["wu0"].astype(dt), dt)
        sh = _norm_stacked(vh, p).astype(dt)

        if spec.edge_feat_dim:
            d_ef = jnp.concatenate(
                [d_rbf.astype(dt), ef.reshape(p, -1).astype(dt)], -1)
        else:
            d_ef = d_rbf.astype(dt)
        y = _mm(d_ef, w["k_edge"].astype(dt), dt)
        y = y + _mm(sh, w["k_sh"].astype(dt), dt)
        y = y + bcast_src(ysrc).astype(dt)
        if has_dst:
            y = y + bcast_dst(ydst_i).astype(dt)
        s = _silu(y + w["b0"].astype(dt), dt)
        gate = _sigmoid(_mm(s, w["g0"].astype(dt), dt) + w["gb0"].astype(dt),
                        dt)
        v = _rep3(gate) * vu

        # ---- remaining layers ----------------------------------------------
        for li in range(1, n_layers):
            s, v = _gvp_tail_layer(w, li, ncp, s, v, p, dt)

        # ---- mask + aggregate over sources (f32 accumulation) --------------
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        gi = i_blk * bi + p_idx // n
        gj = jnp.remainder(p_idx, n)
        maskf = (bcast_dst(nm_i) * bcast_src(nm_all) *
                 (gi != gj).astype(jnp.float32))

        s32 = s.astype(jnp.float32) * maskf
        out_s[0] = jnp.sum(s32.reshape(bi, n, -1), axis=1) / z
        v32 = v.astype(jnp.float32) * _rep3(maskf)
        out_v[0] = jnp.sum(v32.reshape(3, bi, n, -1), axis=2) / z

    return kernel


def pallas_message_agg(w: Dict, spec: MessageStackSpec, sc, s_dst, vc, v_dst,
                       x, ef, node_mask, dtype=None, bi: int = 8):
    """Drop-in replacement for xla_message_agg (same weights, same outputs).

    `bi`: destination rows per grid step.  Requires N % bi == 0 and
    bi * N % 8 == 0 (sublane alignment of coordinate row blocks); when N is
    not divisible by the requested bi, bi is halved until it divides N
    (warning emitted — a degraded grid of small row blocks loses the kernel's
    tiling benefit).
    """
    if spec.message_norm == "mean":
        raise NotImplementedError("pallas path supports 'sum'/const norm")
    dt = dtype or jnp.float32
    B, n = sc.shape[:2]
    requested_bi = bi
    while n % bi:
        bi //= 2
    if bi != requested_bi:
        import warnings
        warnings.warn(
            f"pallas_message_agg: reduced bi {requested_bi} -> {bi} so it "
            f"divides N={n}; grid degrades to {bi}-row blocks", stacklevel=2)
    assert bi >= 1 and (bi * n) % 8 == 0, (n, bi)
    ncp = spec.n_cp_feats
    h0 = spec.h0
    has_dst = spec.s_dst > 0
    n_layers = len(spec.dims)
    _, v_out_last, _, s_out_last = spec.dims[-1]

    # ---- per-node precomputations (XLA; O(N) work) -------------------------
    wh0 = w["wh0"]
    ysrc = sc @ w["k_src"]                                  # (B,N,S0)
    vhs = jnp.einsum("bnvc,vh->bcnh", vc, wh0[1:1 + spec.v_msg])  # (B,3,N,h0)
    nm = node_mask.astype(jnp.float32)[..., None]  # (B, N, 1)
    inputs = [x, x, nm, nm, ysrc, vhs]
    in_specs = [
        pl.BlockSpec((1, bi, 3), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, n, 3), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, bi, 1), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, n, 1), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, n, ysrc.shape[-1]), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, 3, n, h0), lambda b, i: (b, 0, 0, 0)),
    ]
    if has_dst:
        ydst = s_dst @ w["k_dst"]
        vhd = jnp.einsum("bnvc,vh->bcnh", v_dst, wh0[1 + spec.v_msg:])
        inputs += [ydst, vhd]
        in_specs += [
            pl.BlockSpec((1, bi, ydst.shape[-1]), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 3, bi, h0), lambda b, i: (b, 0, i, 0)),
        ]
    if ncp:
        wcp0 = w["wcp0"]
        vcps = jnp.einsum("bnvc,vp->bcnp", vc, wcp0[1:1 + spec.v_msg])
        inputs.append(vcps)
        in_specs.append(pl.BlockSpec((1, 3, n, 2 * ncp),
                                     lambda b, i: (b, 0, 0, 0)))
        if has_dst:
            vcpd = jnp.einsum("bnvc,vp->bcnp", v_dst, wcp0[1 + spec.v_msg:])
            inputs.append(vcpd)
            in_specs.append(pl.BlockSpec((1, 3, bi, 2 * ncp),
                                         lambda b, i: (b, 0, i, 0)))
    if spec.edge_feat_dim:
        inputs.append(ef)
        in_specs.append(pl.BlockSpec((1, bi, n, spec.edge_feat_dim),
                                     lambda b, i: (b, i, 0, 0)))

    weight_names = [k for k in w if k not in ("k_src", "k_dst")]
    for name in weight_names:
        arr = w[name]
        if arr.ndim == 1:  # biases: keep refs >= 2-D for Mosaic
            arr = arr[None, :]
        inputs.append(arr)
        nd = arr.ndim
        in_specs.append(pl.BlockSpec(arr.shape,
                                     functools.partial(_zero_idx, nd)))

    out_shape = (
        jax.ShapeDtypeStruct((B, n, s_out_last), jnp.float32),
        jax.ShapeDtypeStruct((B, 3, n, v_out_last), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, bi, s_out_last), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, 3, bi, v_out_last), lambda b, i: (b, 0, i, 0)),
    )

    kernel = _make_kernel(spec, bi, n, dt, n_layers, weight_names)
    agg_s, agg_v = pl.pallas_call(
        kernel,
        grid=(B, n // bi),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*inputs)
    # (B,3,N,V) -> (B,N,V,3)
    agg_v = jnp.transpose(agg_v, (0, 2, 3, 1))
    return agg_s, agg_v
