"""Fused Pallas TPU kernel for the pairwise message stack + aggregation.

One kernel computes, for a (dst-block i, src-block j) tile of the complete
molecular graph: pairwise geometry (unit displacement + RBF), the factored
layer-0 GVP, the remaining message GVP layers, masking, and the running
masked sum over sources — entirely in VMEM.  No (B, N, N, ·) intermediate is
ever written to HBM (the XLA path materializes several per layer; see
flowmol_tpu/ops/pair_messages.py for the reference semantics this must match
bit-for-bit at bf16 tolerance).

Vector-feature layout inside the kernel is (pairs, 3, channels) so channel
contractions are plain (P*3, C) @ (C, C') MXU matmuls.

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


def _zero_idx(nd, b, i, j):
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


def _cross_cc(a, b):
    """Cross product of per-coordinate lists: a, b are [x, y, z] of (P, C)."""
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _norm_cc(vc, eps=1e-8):
    """Per-coordinate list [(P, C)] * 3 -> (P, C) clamped L2 norm (f32)."""
    acc = sum(v.astype(jnp.float32) ** 2 for v in vc)
    return jnp.sqrt(jnp.maximum(acc, eps))


def _gvp_tail_layer(w, li, ncp, s, vc, dt):
    """Standard GVP on per-pair state: s (P, S), vc = [x,y,z] of (P, V).

    Mosaic cannot reshape small trailing dims, so vector channels live as
    three separate coordinate tensors throughout the kernel."""
    wh = w[f"wh{li}"].astype(dt)
    vh = [_mm(v, wh, dt) for v in vc]
    if ncp:
        wcp = w[f"wcp{li}"].astype(dt)
        vcp = [_mm(v, wcp, dt) for v in vc]
        cp = _cross_cc([v[:, :ncp] for v in vcp], [v[:, ncp:] for v in vcp])
        vh = [jnp.concatenate([h, c], -1) for h, c in zip(vh, cp)]
    wu = w[f"wu{li}"].astype(dt)
    vu = [_mm(h, wu, dt) for h in vh]
    sh = _norm_cc(vh).astype(dt)
    y = _mm(jnp.concatenate([s, sh], -1), w[f"k{li}"].astype(dt), dt) \
        + w[f"b{li}"].astype(dt)
    s_out = _silu(y, dt)
    gate = _sigmoid(_mm(s_out, w[f"g{li}"].astype(dt), dt)
                    + w[f"gb{li}"].astype(dt), dt)
    return s_out, [gate * u for u in vu]


def _make_kernel(spec: MessageStackSpec, bi: int, bj: int, n: int,
                 dt, n_layers: int, weight_names):
    ncp = spec.n_cp_feats
    h0 = spec.h0
    v_msg, v_dst_d = spec.v_msg, spec.v_dst
    has_dst = spec.s_dst > 0
    z = 1.0 if spec.message_norm == "sum" else float(spec.message_norm)
    # rbf centers generated in-kernel via iota (no captured constants)
    rbf_step = spec.rbf_dmax / (spec.rbf_dim - 1)
    rbf_sigma = spec.rbf_dmax / spec.rbf_dim

    def kernel(*refs):
        i_blk = pl.program_id(1)
        j_blk = pl.program_id(2)
        it = iter(refs)
        x_i = next(it)[0]          # (BI, 3)
        x_j = next(it)[0]          # (BJ, 3)
        nm_i = next(it)[0]         # (BI, 1) float
        nm_j = next(it)[0]         # (BJ, 1) float
        ysrc_j = next(it)[0]       # (BJ, S0)
        vhs_j = next(it)[0]        # (BJ, 3*h0)
        if has_dst:
            ydst_i = next(it)[0]   # (BI, S0)
            vhd_i = next(it)[0]    # (BI, 3*h0)
        if ncp:
            vcps_j = next(it)[0]   # (BJ, 3*2ncp)
            if has_dst:
                vcpd_i = next(it)[0]
        ef = next(it)[0] if spec.edge_feat_dim else None  # (BI, BJ, De)
        w = {name: next(it)[...] for name in weight_names}
        out_s = next(it)
        out_v = next(it)

        p = bi * bj

        def bcast_j(t):  # (BJ, C) -> (P, C)
            return jnp.broadcast_to(t[None], (bi,) + t.shape).reshape(
                p, t.shape[-1])

        def bcast_i(t):  # (BI, C) -> (P, C)
            return jnp.broadcast_to(t[:, None], (t.shape[0], bj, t.shape[-1])
                                    ).reshape(p, t.shape[-1])

        # ---- geometry (per-coordinate: Mosaic cannot reshape/split small
        # trailing dims, so vector channels are [x,y,z] lists of (P, C);
        # only static last-dim slices and leading-dim merges are used) ------
        diff3 = bcast_j(x_j) - bcast_i(x_i)                # (P, 3)
        diff_c = [diff3[:, c:c + 1] for c in range(3)]     # 3 x (P, 1)
        d2 = jnp.maximum(sum(d * d for d in diff_c), 1e-8)
        dij = jnp.sqrt(d2) + 1e-8                          # (P, 1)
        xd_c = [d / dij for d in diff_c]                   # unit displacement
        rbf_mu = jax.lax.broadcasted_iota(
            jnp.int32, (1, spec.rbf_dim), 1).astype(jnp.float32) * rbf_step
        d_rbf = jnp.exp(-jnp.square((dij - rbf_mu) / rbf_sigma))

        # ---- layer 0 (factored) --------------------------------------------
        wh0x = w["wh0"][0:1, :].astype(jnp.float32)         # (1, h0)
        # per-node precomputes are packed coordinate-major: [c*h0 : (c+1)*h0]
        vh = [xd_c[c] * wh0x +
              bcast_j(vhs_j[:, c * h0:(c + 1) * h0].astype(jnp.float32))
              for c in range(3)]
        if has_dst:
            vh = [v + bcast_i(vhd_i[:, c * h0:(c + 1) * h0].astype(jnp.float32))
                  for c, v in enumerate(vh)]
        if ncp:
            wcp0x = w["wcp0"][0:1, :].astype(jnp.float32)   # (1, 2ncp)
            m2 = 2 * ncp
            vcp = [xd_c[c] * wcp0x +
                   bcast_j(vcps_j[:, c * m2:(c + 1) * m2].astype(jnp.float32))
                   for c in range(3)]
            if has_dst:
                vcp = [v + bcast_i(vcpd_i[:, c * m2:(c + 1) * m2].astype(
                    jnp.float32)) for c, v in enumerate(vcp)]
            cp = _cross_cc([v[:, :ncp] for v in vcp],
                           [v[:, ncp:] for v in vcp])
            vh = [jnp.concatenate([h, c_], -1) for h, c_ in zip(vh, cp)]
        vh = [h.astype(dt) for h in vh]

        wu0 = w["wu0"].astype(dt)
        vu = [_mm(h, wu0, dt) for h in vh]
        sh = _norm_cc(vh).astype(dt)

        if spec.edge_feat_dim:
            d_ef = jnp.concatenate([d_rbf.astype(dt),
                                    ef.reshape(p, -1).astype(dt)], -1)
        else:
            d_ef = d_rbf.astype(dt)
        y = _mm(d_ef, w["k_edge"].astype(dt), dt)
        y = y + _mm(sh, w["k_sh"].astype(dt), dt)
        ys = jnp.broadcast_to(ysrc_j.astype(dt)[None], (bi, bj, ysrc_j.shape[-1])
                              ).reshape(p, -1)
        y = y + ys
        if has_dst:
            yd = jnp.broadcast_to(ydst_i.astype(dt)[:, None],
                                  (bi, bj, ydst_i.shape[-1])).reshape(p, -1)
            y = y + yd
        s = _silu(y + w["b0"].astype(dt), dt)
        gate = _sigmoid(_mm(s, w["g0"].astype(dt), dt) + w["gb0"].astype(dt),
                        dt)
        v = [gate * u for u in vu]

        # ---- remaining layers --------------------------------------------
        for li in range(1, n_layers):
            s, v = _gvp_tail_layer(w, li, ncp, s, v, dt)

        # ---- mask + accumulate (built directly in (P, 1) space) ------------
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        gi = i_blk * bi + p_idx // bj
        gj = j_blk * bj + jnp.remainder(p_idx, bj)
        maskf = (bcast_i(nm_i) * bcast_j(nm_j) *
                 (gi != gj).astype(jnp.float32))

        s32 = s.astype(jnp.float32) * maskf
        part_s = jnp.sum(s32.reshape(bi, bj, -1), axis=1) / z
        # coordinate-major packed output (BI, 3*V)
        part_v = jnp.concatenate(
            [jnp.sum((u.astype(jnp.float32) * maskf).reshape(bi, bj, -1),
                     axis=1) / z for u in v], axis=-1)

        @pl.when(j_blk == 0)
        def _():
            out_s[0] = part_s
            out_v[0] = part_v

        @pl.when(j_blk > 0)
        def _():
            out_s[0] += part_s
            out_v[0] += part_v

    return kernel


def pallas_message_agg(w: Dict, spec: MessageStackSpec, sc, s_dst, vc, v_dst,
                       x, ef, node_mask, dtype=None, bi: int = 8,
                       bj: int = 32):
    """Drop-in replacement for xla_message_agg (same weights, same outputs).

    Requires N % bi == 0 and N % bj == 0 (bucket sizes are multiples of 16).
    """
    if spec.message_norm == "mean":
        raise NotImplementedError("pallas path supports 'sum'/const norm")
    dt = dtype or jnp.float32
    B, n = sc.shape[:2]
    assert n % bi == 0 and n % bj == 0, (n, bi, bj)
    ncp = spec.n_cp_feats
    h0 = spec.h0
    has_dst = spec.s_dst > 0
    n_layers = len(spec.dims)
    _, v_out_last, _, s_out_last = spec.dims[-1]

    # ---- per-node precomputations (XLA; O(N) work) -------------------------
    wh0 = w["wh0"]
    ysrc = sc @ w["k_src"]                                  # (B,N,S0)
    vhs = jnp.einsum("bnvc,vh->bnch", vc, wh0[1:1 + spec.v_msg])  # (B,N,3,h0)
    vhs = vhs.reshape(B, n, 3 * h0)
    nm3 = node_mask.astype(jnp.float32)[..., None]  # (B, N, 1): Mosaic needs
    # the last two block dims (bi, 1) to divide/equal the array dims
    inputs = [x, x, nm3, nm3, ysrc, vhs]
    in_specs = [
        pl.BlockSpec((1, bi, 3), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bj, 3), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bi, 1), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bj, 1), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bj, ysrc.shape[-1]), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bj, 3 * h0), lambda b, i, j: (b, j, 0)),
    ]
    if has_dst:
        ydst = s_dst @ w["k_dst"]
        vhd = jnp.einsum("bnvc,vh->bnch", v_dst,
                         wh0[1 + spec.v_msg:]).reshape(B, n, 3 * h0)
        inputs += [ydst, vhd]
        in_specs += [
            pl.BlockSpec((1, bi, ydst.shape[-1]), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bi, 3 * h0), lambda b, i, j: (b, i, 0)),
        ]
    if ncp:
        wcp0 = w["wcp0"]
        vcps = jnp.einsum("bnvc,vp->bncp", vc,
                          wcp0[1:1 + spec.v_msg]).reshape(B, n, 3 * 2 * ncp)
        inputs.append(vcps)
        in_specs.append(pl.BlockSpec((1, bj, 3 * 2 * ncp),
                                     lambda b, i, j: (b, j, 0)))
        if has_dst:
            vcpd = jnp.einsum("bnvc,vp->bncp", v_dst,
                              wcp0[1 + spec.v_msg:]).reshape(B, n, 3 * 2 * ncp)
            inputs.append(vcpd)
            in_specs.append(pl.BlockSpec((1, bi, 3 * 2 * ncp),
                                         lambda b, i, j: (b, i, 0)))
    if spec.edge_feat_dim:
        inputs.append(ef)
        in_specs.append(pl.BlockSpec((1, bi, bj, spec.edge_feat_dim),
                                     lambda b, i, j: (b, i, j, 0)))

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
        jax.ShapeDtypeStruct((B, n, 3 * v_out_last), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, bi, s_out_last), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bi, 3 * v_out_last), lambda b, i, j: (b, i, 0)),
    )

    kernel = _make_kernel(spec, bi, bj, n, dt, n_layers, weight_names)
    agg_s, agg_v = pl.pallas_call(
        kernel,
        grid=(B, n // bi, n // bj),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*inputs)
    # (B,N,3*V) -> (B,N,V,3)
    agg_v = agg_v.reshape(B, n, 3, v_out_last).transpose(0, 1, 3, 2)
    return agg_s, agg_v
