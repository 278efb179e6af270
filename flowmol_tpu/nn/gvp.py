"""Geometric Vector Perceptron layers, TPU-native.

Behavioural parity targets (math, not code): /root/reference/flowmol/models/gvp.py
  - `GVP.forward` (gvp.py:90-133): scalar+vector channels, Wh/Wu vector mixing,
    optional cross-product features, vector gating.
  - `GVPDropout` (158-166), `GVPLayerNorm` (169-184), `_VDropout` (135-156).
  - `GVPConv.forward`/`message` (435-543): message passing over the fully
    connected molecular graph with optional compressed messaging, multi-head
    edge-softmax attention, and sum/mean/constant message normalization.

TPU-first design delta: the reference runs per-edge MLPs through DGL's
gather/scatter (`apply_edges` + `update_all`).  Because the molecular graph is
*complete*, message passing here is dense pairwise computation on
(B, N, N, ·) tensors — pure batched matmuls (MXU) and masked reductions, with
no index ops at all.  Convention: index [b, i, j] is the directed edge j -> i
(j = source, i = destination); aggregation is a masked sum over axis 2.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from flowmol_tpu.nn.embedding import norm_no_nan, rbf
from flowmol_tpu.parallel.pairshard import constrain_pairs

# torch-style uniform fan-in init (U(-1/sqrt(fan_in), +1/sqrt(fan_in))),
# matching the reference's Wh/Wu init scheme and torch.nn.Linear defaults.
torch_uniform = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _dense(out: int, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(out, kernel_init=torch_uniform, name=name)


class GVP(nn.Module):
    """One geometric vector perceptron.

    Input/output are (scalars, vectors) with shapes (..., s_in) and
    (..., v_in, 3).  Rotation-equivariant in the vector channel, invariant in
    the scalar channel.

    `dtype` is the matmul compute dtype (params stay float32); norms and
    activations that feed geometry stay in float32.
    """

    v_in: int
    v_out: int
    s_in: int
    s_out: int
    n_cp_feats: int = 0
    hidden_vectors: Optional[int] = None
    vector_gating: bool = True
    scalar_act: str = "silu"
    vector_act: str = "sigmoid"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, sv: Tuple[jnp.ndarray, jnp.ndarray]):
        s, v = sv
        assert v.shape[-1] == 3 and v.shape[-2] == self.v_in, (
            f"vectors have wrong shape {v.shape}, expected (..., {self.v_in}, 3)")
        assert s.shape[-1] == self.s_in, (
            f"scalars have wrong shape {s.shape}, expected (..., {self.s_in})")
        dt = self.dtype or s.dtype

        dim_h = self.hidden_vectors or max(self.v_in, self.v_out)
        wh = self.param("Wh", torch_uniform, (self.v_in, dim_h))
        vh = jnp.einsum("...vc,vh->...hc", v.astype(dt), wh.astype(dt))

        if self.n_cp_feats > 0:
            wcp = self.param("Wcp", torch_uniform, (self.v_in, 2 * self.n_cp_feats))
            vcp = jnp.einsum("...vc,vp->...pc", v.astype(dt), wcp.astype(dt))
            cp_src, cp_dst = jnp.split(vcp, 2, axis=-2)
            cp = jnp.cross(cp_src, cp_dst)
            vh = jnp.concatenate([vh, cp], axis=-2)

        wu = self.param("Wu", torch_uniform, (dim_h + self.n_cp_feats, self.v_out))
        vu = jnp.einsum("...hc,hu->...uc", vh, wu.astype(dt))

        sh = norm_no_nan(vh.astype(jnp.float32), axis=-1)
        s_out = nn.Dense(self.s_out, kernel_init=torch_uniform, dtype=dt,
                         name="to_feats_out")(
            jnp.concatenate([s.astype(dt), sh.astype(dt)], axis=-1))
        s_out = _activation(self.scalar_act)(s_out)

        if self.vector_gating:
            gate = nn.Dense(self.v_out, kernel_init=torch_uniform, dtype=dt,
                            name="scalar_to_vector_gates")(s_out)
        else:
            gate = norm_no_nan(vu.astype(jnp.float32), axis=-1)
        v_out = _activation(self.vector_act)(gate).astype(dt)[..., None] * vu
        return s_out, v_out


def _activation(name: str):
    if name == "silu":
        return jax.nn.silu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "identity":
        return lambda x: x
    raise ValueError(f"unknown activation {name}")


class GVPChain(nn.Module):
    """Sequential stack of GVPs described by a list of (v_in, v_out, s_in, s_out)."""

    dims: Sequence[Tuple[int, int, int, int]]
    n_cp_feats: int = 0
    last_vector_act: str = "sigmoid"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, sv):
        for i, (v_in, v_out, s_in, s_out) in enumerate(self.dims):
            vact = self.last_vector_act if i == len(self.dims) - 1 else "sigmoid"
            sv = GVP(v_in=v_in, v_out=v_out, s_in=s_in, s_out=s_out,
                     n_cp_feats=self.n_cp_feats, vector_act=vact,
                     dtype=self.dtype, name=f"gvp_{i}")(sv)
        return sv


class PairGVP(nn.Module):
    """The first message GVP, factored for the dense pairwise layout.

    Mathematically identical to a GVP over per-pair concatenated inputs
    [s_src, rbf(d), ef, (s_dst)] / [x_diff, v_src, (v_dst)] (the reference's
    `GVPConv.message`, gvp.py:523-543), but all node-sourced matmuls run once
    per *node* and are broadcast-added per pair — turning the dominant
    O(N^2 · D · H) matmuls into O(N · D · H) + cheap adds.  Only genuinely
    per-edge inputs (distance RBF, edge features, vector norms) pay O(N^2)
    matmul cost.
    """

    s_src_dim: int
    s_edge_dim: int          # rbf + edge features (per-pair scalars)
    s_dst_dim: int           # 0 when use_dst_feats is off
    v_src_dim: int
    v_dst_dim: int           # 0 when use_dst_feats is off
    s_out: int
    v_out: int
    n_cp_feats: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, sc, d_ef, s_dst, x_diff, vc, v_dst):
        """sc (B,N,Ds), d_ef (B,N,N,Dde), s_dst (B,N,Dsd)|None,
        x_diff (B,N,N,3), vc (B,N,Dv,3), v_dst (B,N,Dvd,3)|None.
        (Masking happens at aggregation in GVPConv.)"""
        dt = self.dtype or sc.dtype
        v_in = 1 + self.v_src_dim + self.v_dst_dim
        dim_h = max(v_in, self.v_out)

        # ---- vector channel: Vh = Wh^T [x_diff; v_src; v_dst] --------------
        wh = self.param("Wh", torch_uniform, (v_in, dim_h)).astype(dt)
        wh_x, wh_src = wh[0], wh[1:1 + self.v_src_dim]
        vh = jnp.einsum("bijc,h->bijhc", x_diff.astype(dt), wh_x)
        vh_src = jnp.einsum("bnvc,vh->bnhc", vc.astype(dt), wh_src)
        vh = vh + vh_src[:, None, :, :, :]
        if self.v_dst_dim:
            wh_dst = wh[1 + self.v_src_dim:]
            vh_dst = jnp.einsum("bnvc,vh->bnhc", v_dst.astype(dt), wh_dst)
            vh = vh + vh_dst[:, :, None, :, :]

        if self.n_cp_feats > 0:
            wcp = self.param("Wcp", torch_uniform,
                             (v_in, 2 * self.n_cp_feats)).astype(dt)
            wcp_x, wcp_src = wcp[0], wcp[1:1 + self.v_src_dim]
            vcp = jnp.einsum("bijc,p->bijpc", x_diff.astype(dt), wcp_x)
            vcp = vcp + jnp.einsum("bnvc,vp->bnpc", vc.astype(dt),
                                   wcp_src)[:, None]
            if self.v_dst_dim:
                vcp = vcp + jnp.einsum(
                    "bnvc,vp->bnpc", v_dst.astype(dt),
                    wcp[1 + self.v_src_dim:])[:, :, None]
            cp_a, cp_b = jnp.split(vcp, 2, axis=-2)
            vh = jnp.concatenate([vh, jnp.cross(cp_a, cp_b)], axis=-2)

        wu = self.param("Wu", torch_uniform,
                        (dim_h + self.n_cp_feats, self.v_out))
        vu = jnp.einsum("bijhc,hu->bijuc", vh, wu.astype(dt))
        sh = norm_no_nan(vh.astype(jnp.float32), axis=-1)

        # ---- scalar channel: Dense over [s_src, d_ef, (s_dst), sh] ---------
        k_src = self.param("K_src", torch_uniform, (self.s_src_dim, self.s_out))
        k_edge = self.param("K_edge", torch_uniform,
                            (self.s_edge_dim, self.s_out))
        k_sh = self.param("K_sh", torch_uniform,
                          (dim_h + self.n_cp_feats, self.s_out))
        bias = self.param("bias", nn.initializers.zeros, (self.s_out,))
        y = jnp.einsum("bijd,do->bijo", d_ef.astype(dt), k_edge.astype(dt))
        y = y + jnp.einsum("bijh,ho->bijo", sh.astype(dt), k_sh.astype(dt))
        y = y + jnp.einsum("bnd,do->bno", sc.astype(dt),
                           k_src.astype(dt))[:, None]
        if self.s_dst_dim:
            k_dst = self.param("K_dst", torch_uniform,
                               (self.s_dst_dim, self.s_out))
            y = y + jnp.einsum("bnd,do->bno", s_dst.astype(dt),
                               k_dst.astype(dt))[:, :, None]
        s_out = jax.nn.silu(y + bias.astype(dt))

        gate = nn.Dense(self.v_out, kernel_init=torch_uniform, dtype=dt,
                        name="scalar_to_vector_gates")(s_out)
        v_out = jax.nn.sigmoid(gate).astype(dt)[..., None] * vu
        return s_out, v_out


class GVPLayerNorm(nn.Module):
    """LayerNorm on scalars; non-trainable RMS norm over vector channels."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, sv):
        s, v = sv
        s = nn.LayerNorm(epsilon=self.eps)(s)
        vn = norm_no_nan(v, axis=-1, keepdims=True, sqrt=False)
        vn = jnp.sqrt(jnp.mean(vn, axis=-2, keepdims=True) + self.eps) + self.eps
        return s, v / vn


class GVPDropout(nn.Module):
    """Standard dropout on scalars; whole-vector-channel dropout on vectors."""

    rate: float

    @nn.compact
    def __call__(self, sv, deterministic: bool = True):
        s, v = sv
        if self.rate == 0.0 or deterministic:
            return s, v
        s = nn.Dropout(self.rate, deterministic=False)(s)
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, v.shape[:-1])
        v = v * mask[..., None] / keep
        return s, v


def _message_stack_dims(scalar_size: int, vector_size: int, s_msg: int, v_msg: int,
                        n_message_gvps: int, extra_scalar_feats: int,
                        rbf_dim: int, edge_feat_size: int,
                        s_dst: int, v_dst: int):
    """Replicates the reference's message-GVP size interpolation
    (/root/reference/flowmol/models/gvp.py:322-374)."""
    dims = []
    s_slope = (s_msg + extra_scalar_feats - scalar_size) / n_message_gvps
    v_slope = (v_msg - vector_size) / n_message_gvps
    s_out = v_out = None
    for i in range(n_message_gvps):
        if i == 0:
            v_in = v_msg + 1 + v_dst
            s_in = s_msg + rbf_dim + edge_feat_size + s_dst
        else:
            s_in, v_in = s_out, v_out
        if s_msg < scalar_size:
            s_out = int(s_slope * i + scalar_size)
            if i == n_message_gvps - 1:
                s_out = s_msg + extra_scalar_feats
        else:
            s_out = s_msg + extra_scalar_feats
        if v_msg < vector_size:
            v_out = int(v_slope * i + vector_size)
            if i == n_message_gvps - 1:
                v_out = v_msg
        else:
            v_out = v_msg
        dims.append((v_in, v_out, s_in, s_out))
    return dims


class GVPConv(nn.Module):
    """One message-passing block over the complete molecular graph.

    Dense-pairwise equivalent of the reference GVPConv: compression GVPs,
    per-edge message GVP stack, optional multi-head attention (masked softmax
    over sources), masked aggregation, expansion GVPs, residual + GVPLayerNorm
    structure, node-update GVP stack.
    """

    scalar_size: int = 128
    vector_size: int = 16
    n_cp_feats: int = 0
    n_message_gvps: int = 1
    n_update_gvps: int = 1
    attention: bool = False
    s_message_dim: Optional[int] = None
    v_message_dim: Optional[int] = None
    n_heads: int = 1
    n_expansion_gvps: int = 1
    use_dst_feats: bool = False
    dst_feat_msg_reduction_factor: float = 4
    rbf_dmax: float = 20.0
    rbf_dim: int = 16
    edge_feat_size: int = 0
    message_norm: Union[float, str] = 10
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, s, v, ef, x, x_diff, d, pair_mask, node_mask,
                 deterministic: bool = True):
        """
        s: (B,N,Ds) node scalars; v: (B,N,Dv,3) node vectors;
        ef: (B,N,N,De) edge features; x: (B,N,3) positions;
        x_diff: (B,N,N,3) unit j->i displacement (source minus dest);
        d: (B,N,N,rbf_dim); pair_mask: (B,N,N) bool; node_mask: (B,N) bool
        validity mask OR int graph-id array for packed rows
        (graphs.is_graph_ids) — the fused Pallas message kernel consumes the
        raw graph ids; everything else uses the derived bool validity.
        """
        from flowmol_tpu.graphs import node_validity
        node_valid = node_validity(node_mask)
        B, N = s.shape[:2]
        s_msg = self.s_message_dim or self.scalar_size
        v_msg = self.v_message_dim or self.vector_size
        compressed = (s_msg != self.scalar_size) or (v_msg != self.vector_size)
        if self.attention and (s_msg % self.n_heads or v_msg % self.n_heads):
            raise ValueError(
                "Number of attention heads must divide the message size "
                f"(s_msg={s_msg}, v_msg={v_msg}, n_heads={self.n_heads})")

        # --- node compression ------------------------------------------------
        sc, vc = s, v
        if compressed:
            dims = []
            for i in range(self.n_expansion_gvps):
                s_in = self.scalar_size if i == 0 else max(s_msg, self.scalar_size)
                v_in = self.vector_size if i == 0 else max(v_msg, self.vector_size)
                if i == self.n_expansion_gvps - 1:
                    s_out, v_out = s_msg, v_msg
                else:
                    s_out = max(s_msg, self.scalar_size)
                    v_out = max(v_msg, self.vector_size)
                dims.append((v_in, v_out, s_in, s_out))
            sc, vc = GVPChain(dims, self.n_cp_feats, dtype=self.dtype,
                              name="node_compression")((sc, vc))

        # --- destination-node features for messages --------------------------
        s_dst_dim = v_dst_dim = 0
        s_dst = v_dst = None
        if self.use_dst_feats:
            if self.dst_feat_msg_reduction_factor != 1:
                s_dst_dim = int(s_msg / self.dst_feat_msg_reduction_factor)
                v_dst_dim = int(v_msg / self.dst_feat_msg_reduction_factor)
                s_dst, v_dst = GVP(v_in=v_msg, v_out=v_dst_dim, s_in=s_msg,
                                   s_out=s_dst_dim, n_cp_feats=0,
                                   dtype=self.dtype,
                                   name="dst_feat_msg_projection")((sc, vc))
            else:
                s_dst_dim, v_dst_dim = s_msg, v_msg
                s_dst, v_dst = sc, vc

        extra_scalar = 2 * self.n_heads if self.attention else 0
        dt = self.dtype

        # --- message GVP stack ---------------------------------------------
        # [b, i, j]: j is the source node, i the destination.  Layer 0 is the
        # factored PairGVP (node-sourced matmuls run per node, not per pair);
        # remaining layers operate on the per-pair hidden state.
        dims = _message_stack_dims(
            self.scalar_size, self.vector_size, s_msg, v_msg, self.n_message_gvps,
            extra_scalar, self.rbf_dim, self.edge_feat_size, s_dst_dim, v_dst_dim)

        if not self.attention and not compressed:
            # explicit-weight path: shared weights between the XLA compute
            # path and the fused Pallas kernel (flowmol_tpu/ops)
            from flowmol_tpu.ops.pair_messages import (MessageStackSpec,
                                                       init_weights,
                                                       xla_message_agg)
            spec = MessageStackSpec(
                s_msg=s_msg, v_msg=v_msg, s_dst=s_dst_dim, v_dst=v_dst_dim,
                rbf_dim=self.rbf_dim, rbf_dmax=self.rbf_dmax,
                edge_feat_dim=self.edge_feat_size,
                n_cp_feats=self.n_cp_feats, dims=tuple(dims),
                message_norm=self.message_norm)
            wmsg = init_weights(self, spec, torch_uniform)
            agg_s, agg_v = xla_message_agg(
                wmsg, spec, sc, s_dst, vc, v_dst, x, ef, pair_mask,
                dtype=dt)
            return self._finish(s, v, agg_s, agg_v, node_valid,
                                deterministic)

        d_ef = constrain_pairs(
            jnp.concatenate([d, ef], axis=-1) if self.edge_feat_size > 0 else d)
        _, v0_out, _, s0_out = dims[0]
        msg_s, msg_v = PairGVP(
            s_src_dim=s_msg, s_edge_dim=d_ef.shape[-1], s_dst_dim=s_dst_dim,
            v_src_dim=v_msg, v_dst_dim=v_dst_dim, s_out=s0_out, v_out=v0_out,
            n_cp_feats=self.n_cp_feats, dtype=dt,
            name="edge_message_0")(sc, d_ef, s_dst, x_diff, vc, v_dst)
        msg_s, msg_v = constrain_pairs(msg_s), constrain_pairs(msg_v)
        if len(dims) > 1:
            msg_s, msg_v = GVPChain(dims[1:], self.n_cp_feats, dtype=dt,
                                    name="edge_message")((msg_s, msg_v))

        # --- attention over incoming edges --------------------------------------
        if self.attention:
            att_logits = msg_s[..., s_msg:]
            msg_s = msg_s[..., :s_msg]
            att_logits = nn.LayerNorm()(
                nn.Dense(extra_scalar, use_bias=False, kernel_init=torch_uniform,
                         name="att_weight_projection")(att_logits))
            # masked softmax over sources j (axis 2) per destination i
            att_logits = jnp.where(pair_mask[..., None], att_logits, -1e9)
            att = jax.nn.softmax(att_logits, axis=2)
            s_att, v_att = att[..., :self.n_heads], att[..., self.n_heads:]
            s_att = jnp.repeat(s_att, s_msg // self.n_heads, axis=-1)
            v_att = jnp.repeat(v_att, v_msg // self.n_heads, axis=-1)
            msg_s = msg_s * s_att
            msg_v = msg_v * v_att[..., None]

        # --- masked aggregation (accumulate in f32) ---------------------------
        pmf = pair_mask[..., None].astype(msg_s.dtype)
        agg_s = jnp.sum(msg_s * pmf, axis=2, dtype=jnp.float32)
        agg_v = jnp.sum(msg_v * pmf[..., None], axis=2, dtype=jnp.float32)
        if self.message_norm == "mean":
            cnt = jnp.maximum(jnp.sum(pmf, axis=2, dtype=jnp.float32), 1.0)
            agg_s = agg_s / cnt
            agg_v = agg_v / cnt[..., None]
        elif self.message_norm == "sum":
            pass  # z = 1
        else:
            z = float(self.message_norm)
            agg_s = agg_s / z
            agg_v = agg_v / z

        # --- expansion back to node dims ----------------------------------------
        if compressed:
            dims = []
            for i in range(self.n_expansion_gvps):
                s_in = s_msg if i == 0 else self.scalar_size
                v_in = v_msg if i == 0 else self.vector_size
                dims.append((v_in, self.vector_size, s_in, self.scalar_size))
            agg_s, agg_v = GVPChain(dims, self.n_cp_feats, dtype=self.dtype,
                                    name="message_expansion")((agg_s, agg_v))

        return self._finish(s, v, agg_s, agg_v, node_valid, deterministic)

    def _finish(self, s, v, agg_s, agg_v, node_mask, deterministic):
        """Shared tail: dropout -> residual -> layernorm -> node update.
        Called from within the compact __call__ context."""
        drop = GVPDropout(self.dropout)
        agg_s, agg_v = drop((agg_s, agg_v), deterministic)
        s1 = s.astype(jnp.float32) + agg_s.astype(jnp.float32)
        v1 = v.astype(jnp.float32) + agg_v.astype(jnp.float32)
        s1, v1 = GVPLayerNorm(name="message_layer_norm")((s1, v1))

        upd_dims = [(self.vector_size, self.vector_size,
                     self.scalar_size, self.scalar_size)] * self.n_update_gvps
        su, vu = GVPChain(upd_dims, self.n_cp_feats, dtype=self.dtype,
                          name="node_update")((s1, v1))
        su, vu = drop((su, vu), deterministic)
        s2, v2 = GVPLayerNorm(name="update_layer_norm")(
            (s1 + su.astype(jnp.float32), v1 + vu.astype(jnp.float32)))

        # zero out padded nodes so garbage never propagates
        nm = node_mask[..., None].astype(s2.dtype)
        return s2 * nm, v2 * nm[..., None]


class NodePositionUpdate(nn.Module):
    """GVP stack ending in a single vector channel added to positions.

    Parity: /root/reference/flowmol/models/vector_field.py:813-842.
    """

    n_scalars: int
    n_vec_channels: int
    n_gvps: int = 3
    n_cp_feats: int = 0

    @nn.compact
    def __call__(self, s, x, v):
        dims = []
        v_in = self.n_vec_channels
        for i in range(self.n_gvps):
            v_out = 1 if i == self.n_gvps - 1 else self.n_vec_channels
            dims.append((v_in, v_out, self.n_scalars, self.n_scalars))
            v_in = v_out
        _, upd = GVPChain(dims, self.n_cp_feats, last_vector_act="identity",
                          name="gvps")((s, v))
        return x + upd[..., 0, :]


class EdgeUpdate(nn.Module):
    """Edge feature update from endpoint node scalars (+ optional distance RBF).

    Parity: /root/reference/flowmol/models/vector_field.py:844-880.  Dense
    version: for directed edge [b,i,j], "src" is j and "dst" is i.
    """

    n_node_scalars: int
    n_edge_feats: int
    update_edge_w_distance: bool = False
    rbf_dim: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_s, ef, d):
        dt = self.dtype or node_s.dtype
        ns = self.n_node_scalars
        # factored first Dense over [s_src, s_dst, ef, (d)]: the two node
        # blocks of the kernel apply per node and broadcast-add per pair
        k_src = self.param("K_src", torch_uniform, (ns, self.n_edge_feats))
        k_dst = self.param("K_dst", torch_uniform, (ns, self.n_edge_feats))
        k_ef = self.param("K_ef", torch_uniform,
                          (ef.shape[-1], self.n_edge_feats))
        bias = self.param("bias", nn.initializers.zeros, (self.n_edge_feats,))
        nsd = node_s.astype(dt)
        h = jnp.einsum("bijd,do->bijo", ef.astype(dt), k_ef.astype(dt))
        h = h + jnp.einsum("bnd,do->bno", nsd, k_src.astype(dt))[:, None]
        h = h + jnp.einsum("bnd,do->bno", nsd, k_dst.astype(dt))[:, :, None]
        if self.update_edge_w_distance:
            k_d = self.param("K_d", torch_uniform,
                             (d.shape[-1], self.n_edge_feats))
            h = h + jnp.einsum("bijd,do->bijo", d.astype(dt), k_d.astype(dt))
        h = jax.nn.silu(h + bias.astype(dt))
        h = jax.nn.silu(nn.Dense(self.n_edge_feats, kernel_init=torch_uniform,
                                 dtype=dt)(h))
        return nn.LayerNorm()(ef.astype(jnp.float32) + h.astype(jnp.float32))
