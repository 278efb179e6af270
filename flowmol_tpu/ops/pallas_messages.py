"""Fused Pallas TPU kernel for the pairwise message stack + aggregation.

One grid cell computes, for a block of `bi` destination rows of one padded
batch row, messages from ALL N sources: pairwise geometry (unit displacement
+ RBF), the factored layer-0 GVP, the remaining message GVP layers, masking,
and the masked sum over sources — entirely in VMEM.  No (B, N, N, ·)
intermediate is ever written to HBM.  The XLA path
(flowmol_tpu/ops/pair_messages.py::xla_message_agg) materializes ~25 pair
tensors per conv per step (profiled round 4: >80% of sampler step time);
this kernel is the speed-of-light alternative for the sampling hot loop.

Design notes (v3, tuned on v5e — v2 ran at 3.3x its padded-MXU bound):
  * pair index space is flattened to rows: P = bi * N pairs per grid cell,
    channels in lanes — every matmul is a plain (rows, K) @ (K, C') MXU op;
  * vector features are *coordinate-stacked*: one (3P, C) tensor whose row
    blocks are the x/y/z coordinates, so per-coordinate channel mixes run as
    a single matmul of M = 3P (cross products and norms slice the P-sized
    row blocks back out — static sublane slices);
  * weights are MERGED and PRE-CAST on the host: [Wh | Wcp] is one matmul,
    layer 0's [K_edge; K_sh] is one matmul, and everything enters the kernel
    in the compute dtype — v2 re-cast f32 weights inside every grid cell;
  * per-node terms of the factored layer 0 (source/dst channel mixes) are
    precomputed OUTSIDE at O(B·N) cost and broadcast in-kernel;
  * masks support BOTH one-molecule-per-row bool masks and packed graph-id
    rows (flowmol_tpu.graphs.is_graph_ids): the mask is
    (gid_i == gid_j) & valid_i & valid_j & (i != j), computed from a single
    f32 gid array (bool masks encode gid=0 for valid, -1 for padding);
  * state is bf16 end to end; vector norms and the final aggregation
    accumulate in f32.

Covers message_norm in {'sum', const}; no attention / no compressed
messaging (flowmol3-class configs).  Forward-only: used on the sampling
path; training uses the XLA path (same weights).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowmol_tpu.ops.pair_messages import MessageStackSpec


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
    """Standard GVP on per-pair state: s (P, S), v (3P, V) coord-stacked.

    Slice-free layout (Mosaic charges ~0.16ms per unaligned lane slice of
    even a tiny tensor): the channel mix emits [Wcp_a | Wh] so the only
    slice is offset-0 (free); cross partner b comes from its own matmul;
    Wu / K carry zero rows for the a-block so the merged tensors feed
    matmuls without ever being sliced or lane-concatenated.
    """
    vah = _mm(v, w[f"wah{li}"], dt)             # (3P, ncp + h) = [a | vh]
    if ncp:
        b = _mm(v, w[f"wcpb{li}"], dt)          # (3P, ncp)
        cp = _cross_stacked(vah[:, :ncp], b, p)  # offset-0 slice only
        vu = _mm(vah, w[f"wu{li}"], dt) + _mm(cp, w[f"wucp{li}"], dt)
        sh_cp = _norm_stacked(cp, p).astype(dt)
        y = (_mm(jnp.concatenate([s, _norm_stacked(vah, p).astype(dt)], -1),
                 w[f"k{li}"], dt)
             + _mm(sh_cp, w[f"kcp{li}"], dt) + w[f"b{li}"])
    else:
        vu = _mm(vah, w[f"wu{li}"], dt)
        sh = _norm_stacked(vah, p).astype(dt)
        y = _mm(jnp.concatenate([s, sh], -1), w[f"k{li}"], dt) + w[f"b{li}"]
    s_out = _silu(y, dt)
    gate = _sigmoid(_mm(s_out, w[f"g{li}"], dt) + w[f"gb{li}"], dt)
    return s_out, _rep3(gate) * vu


def _make_kernel(spec: MessageStackSpec, bi: int, n: int, dt, n_layers: int,
                 weight_names):
    ncp = spec.n_cp_feats
    h0 = spec.h0
    has_dst = spec.s_dst > 0
    z = 1.0 if spec.message_norm == "sum" else float(spec.message_norm)
    # rbf centers generated in-kernel via iota (matches embedding.rbf:
    # mu = linspace(0, d_max, d_count), sigma = d_max / d_count)
    rbf_step = spec.rbf_dmax / (spec.rbf_dim - 1)
    rbf_sigma = spec.rbf_dmax / spec.rbf_dim

    def kernel(*refs):
        i_blk = pl.program_id(1)
        it = iter(refs)
        x_i = next(it)[0]          # (BI, 3) f32
        x_all = next(it)[0]        # (N, 3) f32
        gid_i = next(it)[0]        # (BI, 1) f32 (graph id; < 0 = padding)
        gid_all = next(it)[0]      # (N, 1) f32
        ysrc = next(it)[0]         # (N, S0) dt
        vhs = next(it)[0]          # (3, N, ncp + h0) dt coordinate-major
        if ncp:
            vbs = next(it)[0]      # (3, N, ncp) dt
        if has_dst:
            ydst_i = next(it)[0]   # (BI, S0) dt
            vhd_i = next(it)[0]    # (3, BI, ncp + h0) dt
            if ncp:
                vbd_i = next(it)[0]  # (3, BI, ncp) dt
        ef = next(it)[0] if spec.edge_feat_dim else None  # (BI, N, De) dt
        w = {name: next(it)[...] for name in weight_names}
        out_s = next(it)
        out_v = next(it)

        p = bi * n

        # ---- one-hot selectors: broadcasts and segment-sums as MXU matmuls.
        # v3 used VPU sublane broadcast+reshape / reshape+reduce here; staged
        # mini-kernels measured those at ~128 elems/cycle (~0.3ms per
        # conv-shaped call), ~8x the elementwise bound, dwarfing the actual
        # matmul work.  A (P, N) one-hot matmul does the same data movement
        # through the MXU at ~6 rows/cycle.
        row = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (p, n), 1)
        sel_src = (jnp.remainder(row, n) == col).astype(dt)      # (P, N)
        rowd = jax.lax.broadcasted_iota(jnp.int32, (p, bi), 0)
        cold = jax.lax.broadcasted_iota(jnp.int32, (p, bi), 1)
        sel_dst = ((rowd // n) == cold).astype(dt)               # (P, BI)

        def bcast_src(t):  # (N, C) -> (P, C): same source row for every dst
            return _mm(sel_src, t.astype(dt), dt)

        def bcast_dst(t):  # (BI, C) -> (P, C)
            return _mm(sel_dst, t.astype(dt), dt)

        def bcast_src_vpu(t):  # narrow (N, C<=3): VPU broadcast is fine
            return jnp.broadcast_to(t[None], (bi,) + t.shape).reshape(
                p, t.shape[-1])

        def bcast_dst_vpu(t):
            return jnp.broadcast_to(t[:, None], (bi, n, t.shape[-1])
                                    ).reshape(p, t.shape[-1])

        # ---- geometry (f32) -------------------------------------------------
        diff = bcast_src_vpu(x_all) - bcast_dst_vpu(x_i)   # (P, 3)
        d2 = jnp.maximum(jnp.sum(diff * diff, -1, keepdims=True), 1e-8)
        dij = jnp.sqrt(d2) + 1e-8                          # (P, 1)
        xdu = (diff / dij).astype(dt)                      # unit displacement
        rbf_mu = jax.lax.broadcasted_iota(
            jnp.int32, (1, spec.rbf_dim), 1).astype(jnp.float32) * rbf_step
        d_rbf = jnp.exp(-jnp.square((dij - rbf_mu) / rbf_sigma)).astype(dt)

        # ---- layer 0 (factored): x-sourced outer product + per-node mixes --
        # vah0 = [a | vh] per coordinate; b0v separate (slice-free layout)
        wx0 = w["l0x"]                                     # (1, ncp + h0)
        parts = [xdu[:, c:c + 1] * wx0 + bcast_src(vhs[c]) for c in range(3)]
        if has_dst:
            parts = [pc + bcast_dst(vhd_i[c]) for c, pc in enumerate(parts)]
        vah = jnp.concatenate(parts, axis=0)               # (3P, ncp + h0)
        if ncp:
            wxb0 = w["l0xb"]                               # (1, ncp)
            bparts = [xdu[:, c:c + 1] * wxb0 + bcast_src(vbs[c])
                      for c in range(3)]
            if has_dst:
                bparts = [pc + bcast_dst(vbd_i[c])
                          for c, pc in enumerate(bparts)]
            bv = jnp.concatenate(bparts, axis=0)           # (3P, ncp)
            cp = _cross_stacked(vah[:, :ncp], bv, p)
            vu = _mm(vah, w["wu0"], dt) + _mm(cp, w["wucp0"], dt)
            sh_cp = _norm_stacked(cp, p).astype(dt)
        else:
            vu = _mm(vah, w["wu0"], dt)

        sh = _norm_stacked(vah, p).astype(dt)              # [|a| | |vh|]
        y = _mm(d_rbf, w["k_rbf"], dt)
        if spec.edge_feat_dim:
            y = y + _mm(ef.reshape(p, -1), w["k_ef"], dt)
        y = y + _mm(sh, w["k0"], dt)
        if ncp:
            y = y + _mm(sh_cp, w["kcp0"], dt)
        y = y + bcast_src(ysrc)
        if has_dst:
            y = y + bcast_dst(ydst_i)
        s = _silu(y + w["b0"], dt)
        gate = _sigmoid(_mm(s, w["g0"], dt) + w["gb0"], dt)
        v = _rep3(gate) * vu

        # ---- remaining layers ----------------------------------------------
        for li in range(1, n_layers):
            s, v = _gvp_tail_layer(w, li, ncp, s, v, p, dt)

        # ---- mask + aggregate over sources (f32 accumulation) --------------
        # the masked segment-sum over sources is a (BI, P) x (P, C) matmul
        # with the mask folded into the one-hot dst selector: MXU does the
        # reduction with f32 accumulation, no sublane reshape-reduce.
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        same_node = (i_blk * bi + p_idx // n) == jnp.remainder(p_idx, n)
        gd = bcast_dst_vpu(gid_i)
        gs = bcast_src_vpu(gid_all)
        maskf = ((gd == gs) & (gd >= 0.0) & ~same_node).astype(dt)

        selm = sel_dst * maskf                             # (P, BI)
        dn = (((0,), (0,)), ((), ()))                      # contract dim 0
        prec = (jax.lax.Precision.DEFAULT if dt == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        out_s[0] = jax.lax.dot_general(
            selm, s, dn, preferred_element_type=jnp.float32,
            precision=prec) / z                            # (BI, S)
        vm = []
        for c in range(3):
            vm.append(jax.lax.dot_general(
                selm, v[c * p:(c + 1) * p], dn,
                preferred_element_type=jnp.float32, precision=prec))
        out_v[0] = jnp.stack(vm, axis=0) / z               # (3, BI, V)

    return kernel


def _pick_bi(n: int, target_pairs: int = 2048) -> int:
    """Pick the destination-rows-per-cell block size.

    Mosaic requires the block's sublane dim to be a multiple of 8 or equal
    to the array dim, so bi must divide n AND (bi % 8 == 0 or bi == n).
    Among valid choices prefer the largest with bi * n <= target_pairs
    (VMEM-sized at bf16; P > ~3k pairs fails remote compile on the v5e);
    fall back to the smallest valid block when none fits the target."""
    valid = [d for d in range(1, n + 1)
             if n % d == 0 and (d % 8 == 0 or d == n)]
    fitting = [d for d in valid if d * n <= target_pairs]
    return max(fitting) if fitting else min(valid)


def pallas_message_agg(w: Dict, spec: MessageStackSpec, sc, s_dst, vc, v_dst,
                       x, ef, node_mask, dtype=None, bi: Optional[int] = None):
    """Drop-in replacement for xla_message_agg (same weights, same outputs).

    `node_mask`: (B, N) bool validity mask OR int graph-id array (packed
    rows — graphs.is_graph_ids convention: ids >= 0, padding -1).
    `bi`: destination rows per grid cell; default picks the largest divisor
    of N with bi * N <= 2048 pairs (VMEM-sized at bf16).
    """
    if spec.message_norm == "mean":
        raise NotImplementedError("pallas path supports 'sum'/const norm")
    dt = dtype or jnp.float32
    B, n = sc.shape[:2]
    if bi is None:
        bi = _pick_bi(n)
    elif n % bi or (bi % 8 and bi != n):
        valid = [d for d in range(1, n + 1)
                 if n % d == 0 and (d % 8 == 0 or d == n)]
        below = [d for d in valid if d <= bi]
        bi = max(below) if below else min(valid)
    ncp = spec.n_cp_feats
    h0 = spec.h0
    has_dst = spec.s_dst > 0
    n_layers = len(spec.dims)
    _, v_out_last, _, s_out_last = spec.dims[-1]

    if jnp.issubdtype(node_mask.dtype, jnp.integer):
        gid = node_mask.astype(jnp.float32)
    else:
        gid = jnp.where(node_mask, 0.0, -1.0)
    gid = gid[..., None]                                    # (B, N, 1)

    # ---- merged, pre-cast, slice-free weights --------------------------------
    # the kernel's channel mixes emit [a | vh]; Wu/K carry zero rows for the
    # a-block so no tensor is ever lane-sliced at a nonzero offset in-kernel
    wh0, wu0 = w["wh0"], w["wu0"]
    wcp0 = w.get("wcp0")
    h0 = spec.h0
    kw = {}

    def zrows(n_z, m):
        return jnp.concatenate([jnp.zeros((n_z, m.shape[1]), m.dtype), m], 0)

    if ncp:
        wcpa0, wcpb0 = wcp0[:, :ncp], wcp0[:, ncp:]
        kw["l0x"] = jnp.concatenate([wcpa0[0:1], wh0[0:1]], axis=1)
        kw["l0xb"] = wcpb0[0:1]
        wsrc0 = jnp.concatenate([wcpa0[1:1 + spec.v_msg],
                                 wh0[1:1 + spec.v_msg]], axis=1)
        wsrcb0 = wcpb0[1:1 + spec.v_msg]
        kw["wu0"] = zrows(ncp, wu0[:h0])
        kw["wucp0"] = wu0[h0:]
        kw["k0"] = zrows(ncp, w["k_sh"][:h0])
        kw["kcp0"] = w["k_sh"][h0:]
    else:
        kw["l0x"] = wh0[0:1]
        wsrc0 = wh0[1:1 + spec.v_msg]
        wsrcb0 = None
        kw["wu0"] = wu0
        kw["k0"] = w["k_sh"]
    kw["k_rbf"] = w["k_edge"][:spec.rbf_dim]
    if spec.edge_feat_dim:
        kw["k_ef"] = w["k_edge"][spec.rbf_dim:]
    kw["b0"] = w["b0"][None, :]
    kw["g0"] = w["g0"]
    kw["gb0"] = w["gb0"][None, :]
    for li in range(1, n_layers):
        v_in, v_out, s_in, s_out = spec.dims[li]
        h = max(v_in, v_out)
        if ncp:
            wcp = w[f"wcp{li}"]
            kw[f"wah{li}"] = jnp.concatenate(
                [wcp[:, :ncp], w[f"wh{li}"]], axis=1)
            kw[f"wcpb{li}"] = wcp[:, ncp:]
            wu = w[f"wu{li}"]
            kw[f"wu{li}"] = zrows(ncp, wu[:h])
            kw[f"wucp{li}"] = wu[h:]
            k = w[f"k{li}"]
            kw[f"k{li}"] = jnp.concatenate(
                [k[:s_in], jnp.zeros((ncp, k.shape[1]), k.dtype),
                 k[s_in:s_in + h]], axis=0)
            kw[f"kcp{li}"] = k[s_in + h:]
        else:
            kw[f"wah{li}"] = w[f"wh{li}"]
            kw[f"wu{li}"] = w[f"wu{li}"]
            kw[f"k{li}"] = w[f"k{li}"]
        kw[f"b{li}"] = w[f"b{li}"][None, :]
        kw[f"g{li}"] = w[f"g{li}"]
        kw[f"gb{li}"] = w[f"gb{li}"][None, :]
    kw = {k: v.astype(dt) for k, v in kw.items()}

    # ---- per-node precomputations (XLA; O(B*N) work) ------------------------
    ysrc = (sc @ w["k_src"]).astype(dt)                     # (B, N, S0)
    vhs = jnp.einsum("bnvc,vh->bcnh", vc, wsrc0).astype(dt)  # (B,3,N,ncp+h0)
    inputs = [x, x, gid, gid, ysrc, vhs]
    in_specs = [
        pl.BlockSpec((1, bi, 3), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, n, 3), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, bi, 1), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, n, 1), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, n, ysrc.shape[-1]), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, 3, n, vhs.shape[-1]), lambda b, i: (b, 0, 0, 0)),
    ]
    if ncp:
        vbs = jnp.einsum("bnvc,vh->bcnh", vc, wsrcb0).astype(dt)
        inputs.append(vbs)
        in_specs.append(pl.BlockSpec((1, 3, n, ncp), lambda b, i: (b, 0, 0, 0)))
    if has_dst:
        wh0d = wh0[1 + spec.v_msg:]
        if ncp:
            wd = jnp.concatenate([wcp0[1 + spec.v_msg:, :ncp], wh0d], axis=1)
        else:
            wd = wh0d
        ydst = (s_dst @ w["k_dst"]).astype(dt)
        vhd = jnp.einsum("bnvc,vh->bcnh", v_dst, wd).astype(dt)
        inputs += [ydst, vhd]
        in_specs += [
            pl.BlockSpec((1, bi, ydst.shape[-1]), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 3, bi, vhd.shape[-1]), lambda b, i: (b, 0, i, 0)),
        ]
        if ncp:
            vbd = jnp.einsum("bnvc,vh->bcnh", v_dst,
                             wcp0[1 + spec.v_msg:, ncp:]).astype(dt)
            inputs.append(vbd)
            in_specs.append(pl.BlockSpec((1, 3, bi, ncp),
                                         lambda b, i: (b, 0, i, 0)))
    if spec.edge_feat_dim:
        inputs.append(ef.astype(dt))
        in_specs.append(pl.BlockSpec((1, bi, n, spec.edge_feat_dim),
                                     lambda b, i: (b, i, 0, 0)))

    weight_names = list(kw.keys())
    for name in weight_names:
        arr = kw[name]
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            arr.shape, functools.partial(lambda nd, b, i: (0,) * nd, arr.ndim)))

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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*inputs)
    # (B,3,N,V) -> (B,N,V,3)
    agg_v = jnp.transpose(agg_v, (0, 2, 3, 1))
    return agg_s, agg_v
