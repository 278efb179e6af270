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

    @nn.compact
    def __call__(self, sv: Tuple[jnp.ndarray, jnp.ndarray]):
        s, v = sv
        assert v.shape[-1] == 3 and v.shape[-2] == self.v_in, (
            f"vectors have wrong shape {v.shape}, expected (..., {self.v_in}, 3)")
        assert s.shape[-1] == self.s_in, (
            f"scalars have wrong shape {s.shape}, expected (..., {self.s_in})")

        dim_h = self.hidden_vectors or max(self.v_in, self.v_out)
        wh = self.param("Wh", torch_uniform, (self.v_in, dim_h))
        vh = jnp.einsum("...vc,vh->...hc", v, wh)

        if self.n_cp_feats > 0:
            wcp = self.param("Wcp", torch_uniform, (self.v_in, 2 * self.n_cp_feats))
            vcp = jnp.einsum("...vc,vp->...pc", v, wcp)
            cp_src, cp_dst = jnp.split(vcp, 2, axis=-2)
            cp = jnp.cross(cp_src, cp_dst)
            vh = jnp.concatenate([vh, cp], axis=-2)

        wu = self.param("Wu", torch_uniform, (dim_h + self.n_cp_feats, self.v_out))
        vu = jnp.einsum("...hc,hu->...uc", vh, wu)

        sh = norm_no_nan(vh, axis=-1)
        s_out = _dense(self.s_out, name="to_feats_out")(
            jnp.concatenate([s, sh], axis=-1))
        s_out = _activation(self.scalar_act)(s_out)

        if self.vector_gating:
            gate = _dense(self.v_out, name="scalar_to_vector_gates")(s_out)
        else:
            gate = norm_no_nan(vu, axis=-1)
        v_out = _activation(self.vector_act)(gate)[..., None] * vu
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

    @nn.compact
    def __call__(self, sv):
        for i, (v_in, v_out, s_in, s_out) in enumerate(self.dims):
            vact = self.last_vector_act if i == len(self.dims) - 1 else "sigmoid"
            sv = GVP(v_in=v_in, v_out=v_out, s_in=s_in, s_out=s_out,
                     n_cp_feats=self.n_cp_feats, vector_act=vact,
                     name=f"gvp_{i}")(sv)
        return sv


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

    @nn.compact
    def __call__(self, s, v, ef, x_diff, d, pair_mask, node_mask,
                 deterministic: bool = True):
        """
        s: (B,N,Ds) node scalars; v: (B,N,Dv,3) node vectors;
        ef: (B,N,N,De) edge features; x_diff: (B,N,N,3) unit j->i displacement
        (source minus dest); d: (B,N,N,rbf_dim); pair_mask: (B,N,N) bool;
        node_mask: (B,N) bool.
        """
        B, N = s.shape[:2]
        s_msg = self.s_message_dim or self.scalar_size
        v_msg = self.v_message_dim or self.vector_size
        compressed = (s_msg != self.scalar_size) or (v_msg != self.vector_size)

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
            sc, vc = GVPChain(dims, self.n_cp_feats, name="node_compression")((sc, vc))

        # --- destination-node features for messages --------------------------
        s_dst_dim = v_dst_dim = 0
        s_dst = v_dst = None
        if self.use_dst_feats:
            if self.dst_feat_msg_reduction_factor != 1:
                s_dst_dim = int(s_msg / self.dst_feat_msg_reduction_factor)
                v_dst_dim = int(v_msg / self.dst_feat_msg_reduction_factor)
                s_dst, v_dst = GVP(v_in=v_msg, v_out=v_dst_dim, s_in=s_msg,
                                   s_out=s_dst_dim, n_cp_feats=0,
                                   name="dst_feat_msg_projection")((sc, vc))
            else:
                s_dst_dim, v_dst_dim = s_msg, v_msg
                s_dst, v_dst = sc, vc

        extra_scalar = 2 * self.n_heads if self.attention else 0

        # --- build per-pair message inputs ------------------------------------
        # [b, i, j]: j is the source node, i the destination.
        scalar_parts = [
            jnp.broadcast_to(sc[:, None, :, :], (B, N, N, sc.shape[-1])),
            d,
        ]
        if self.edge_feat_size > 0:
            scalar_parts.append(ef)
        if self.use_dst_feats:
            scalar_parts.append(
                jnp.broadcast_to(s_dst[:, :, None, :], (B, N, N, s_dst_dim)))
        msg_s = jnp.concatenate(scalar_parts, axis=-1)

        vec_parts = [
            x_diff[:, :, :, None, :],
            jnp.broadcast_to(vc[:, None, :, :, :], (B, N, N) + vc.shape[-2:]),
        ]
        if self.use_dst_feats:
            vec_parts.append(
                jnp.broadcast_to(v_dst[:, :, None, :, :], (B, N, N, v_dst_dim, 3)))
        msg_v = jnp.concatenate(vec_parts, axis=-2)

        # --- message GVP stack -------------------------------------------------
        dims = _message_stack_dims(
            self.scalar_size, self.vector_size, s_msg, v_msg, self.n_message_gvps,
            extra_scalar, self.rbf_dim, self.edge_feat_size, s_dst_dim, v_dst_dim)
        msg_s, msg_v = GVPChain(dims, self.n_cp_feats, name="edge_message")((msg_s, msg_v))

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

        # --- masked aggregation ---------------------------------------------------
        pmf = pair_mask[..., None].astype(msg_s.dtype)
        agg_s = jnp.sum(msg_s * pmf, axis=2)
        agg_v = jnp.sum(msg_v * pmf[..., None], axis=2)
        if self.message_norm == "mean":
            cnt = jnp.maximum(jnp.sum(pmf, axis=2), 1.0)
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
            agg_s, agg_v = GVPChain(dims, self.n_cp_feats, name="message_expansion")(
                (agg_s, agg_v))

        # --- residual / norm / node update ----------------------------------------
        drop = GVPDropout(self.dropout)
        agg_s, agg_v = drop((agg_s, agg_v), deterministic)
        s1 = s + agg_s
        v1 = v + agg_v
        s1, v1 = GVPLayerNorm(name="message_layer_norm")((s1, v1))

        upd_dims = [(self.vector_size, self.vector_size,
                     self.scalar_size, self.scalar_size)] * self.n_update_gvps
        su, vu = GVPChain(upd_dims, self.n_cp_feats, name="node_update")((s1, v1))
        su, vu = drop((su, vu), deterministic)
        s2, v2 = GVPLayerNorm(name="update_layer_norm")((s1 + su, v1 + vu))

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

    @nn.compact
    def __call__(self, node_s, ef, d):
        B, N = node_s.shape[:2]
        parts = [
            jnp.broadcast_to(node_s[:, None, :, :], (B, N, N, node_s.shape[-1])),  # src j
            jnp.broadcast_to(node_s[:, :, None, :], (B, N, N, node_s.shape[-1])),  # dst i
            ef,
        ]
        if self.update_edge_w_distance:
            parts.append(d)
        h = jnp.concatenate(parts, axis=-1)
        h = jax.nn.silu(_dense(self.n_edge_feats)(h))
        h = jax.nn.silu(_dense(self.n_edge_feats)(h))
        return nn.LayerNorm()(ef + h)
