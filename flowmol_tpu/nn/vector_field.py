"""The FlowMol denoiser network (endpoint predictor), TPU-native.

Behavioural parity target: `EndpointVectorField` in
/root/reference/flowmol/models/vector_field.py (token embeddings 111-121,
scalar/edge embedding MLPs 124-138, GVPConv stack 140-162, interleaved
NodePositionUpdate/EdgeUpdate 164-173, output heads 176-186, self-conditioning
188-197 & 264-289, zero-CoM projection 346-350) and
`SelfConditioningResidualLayer` in
/root/reference/flowmol/models/self_conditioning.py.

Design deltas for TPU:
  * operates on dense padded (B, N, ...) tensors (see flowmol_tpu.graphs);
  * one compiled graph: the train-time self-conditioning coin flip is a
    per-molecule blend mask instead of Python branching;
  * `jax.checkpoint` (via nn.remat) around each conv block to bound HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from flowmol_tpu.graphs import (node_mask_to_pair_mask, node_validity,
                                remove_com as graphs_remove_com,
                                symmetrize_edge_feats)
from flowmol_tpu.nn.embedding import norm_no_nan, rbf, time_embedding
from flowmol_tpu.parallel.pairshard import constrain_pairs
from flowmol_tpu.nn.gvp import (EdgeUpdate, GVPConv, NodePositionUpdate,
                                _dense, torch_uniform)


@dataclasses.dataclass(frozen=True)
class VectorFieldConfig:
    """Static architecture config (mirrors the YAML `vector_field` section)."""

    n_atom_types: int
    n_charges: int = 6
    n_bond_types: int = 4
    has_mask: bool = False  # CTMC: categorical inputs carry a mask-token column
    n_vec_channels: int = 16
    n_cp_feats: int = 0
    n_hidden_scalars: int = 64
    n_hidden_edge_feats: int = 64
    n_recycles: int = 1
    n_molecule_updates: int = 2
    convs_per_update: int = 2
    n_message_gvps: int = 3
    n_update_gvps: int = 3
    n_expansion_gvps: int = 3
    separate_mol_updaters: bool = False
    message_norm: Union[float, str] = 100
    update_edge_w_distance: bool = False
    rbf_dmax: float = 20.0
    rbf_dim: int = 16
    time_embedding_dim: int = 1
    a_token_dim: int = 0
    c_token_dim: int = 0
    e_token_dim: int = 0
    attention: bool = False
    n_heads: int = 1
    s_message_dim: Optional[int] = None
    v_message_dim: Optional[int] = None
    dropout: float = 0.0
    self_conditioning: bool = False
    use_dst_feats: bool = False
    dst_feat_msg_reduction_factor: float = 4
    remat: bool = True
    # matmul compute dtype for the message-passing hot loop; residuals,
    # layernorms and all geometry stay float32
    compute_dtype: str = "bfloat16"

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None

    @property
    def n_cat_feats(self) -> Dict[str, int]:
        return {"a": self.n_atom_types, "c": self.n_charges, "e": self.n_bond_types}

    @property
    def n_mask_feats(self) -> int:
        return int(self.has_mask)

    @classmethod
    def from_config(cls, vf_cfg: dict, n_atom_types: int, n_charges: int,
                    n_bond_types: int, has_mask: bool) -> "VectorFieldConfig":
        """Build from the reference YAML schema, ignoring sampling-only knobs."""
        keys = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in (vf_cfg or {}).items() if k in keys and v is not None}
        return cls(n_atom_types=n_atom_types, n_charges=n_charges,
                   n_bond_types=n_bond_types, has_mask=has_mask, **kw)


def pairwise_rbf(x: jnp.ndarray, rbf_dmax: float, rbf_dim: int):
    """RBF-embedded pairwise distances only: (B,N,3) -> (B,N,N,rbf_dim)."""
    diff = x[:, None, :, :] - x[:, :, None, :]
    dij = norm_no_nan(diff, axis=-1) + 1e-8
    return rbf(dij, d_max=rbf_dmax, d_count=rbf_dim)


def pairwise_distances(x: jnp.ndarray, rbf_dmax: float, rbf_dim: int):
    """x (B,N,3) -> unit displacement x_diff (B,N,N,3) with [b,i,j] = unit(x_j - x_i),
    and RBF-embedded distances d (B,N,N,rbf_dim).

    Dense equivalent of `precompute_distances`
    (/root/reference/flowmol/models/vector_field.py:371-386).
    """
    diff = x[:, None, :, :] - x[:, :, None, :]  # [b,i,j] = x_j - x_i (src - dst)
    dij = norm_no_nan(diff, axis=-1, keepdims=True) + 1e-8
    x_diff = diff / dij
    d = rbf(dij[..., 0], d_max=rbf_dmax, d_count=rbf_dim)
    return x_diff, d


class SelfConditioningResidual(nn.Module):
    """Residual MLPs injecting the previous endpoint prediction.

    Parity: /root/reference/flowmol/models/self_conditioning.py:9-103.
    """

    cfg: VectorFieldConfig

    @nn.compact
    def __call__(self, s, x, ef, prev: Dict[str, jnp.ndarray], node_mask):
        c = self.cfg
        # node branch: distance from current position to predicted endpoint
        d_node = norm_no_nan(x - prev["x"], axis=-1)
        d_node = rbf(d_node, d_max=c.rbf_dmax, d_count=c.rbf_dim)
        node_in = jnp.concatenate([s, prev["a"], prev["c"], d_node], axis=-1)
        h = jax.nn.silu(_dense(c.n_hidden_scalars)(node_in))
        h = jax.nn.silu(_dense(c.n_hidden_scalars)(h))
        s_out = s + h

        # edge branch: change in RBF-embedded edge length to the endpoint
        # (per-pair MLPs run in the compute dtype — this is per-step hot work
        # on the sampling path)
        dt = c.dtype
        d_t = constrain_pairs(pairwise_rbf(x, c.rbf_dmax, c.rbf_dim))
        d_1 = constrain_pairs(pairwise_rbf(prev["x"], c.rbf_dmax, c.rbf_dim))
        ef_sym = symmetrize_edge_feats(ef)  # canonical upper-triangle values
        edge_in = jnp.concatenate([ef_sym.astype(dt), prev["e"].astype(dt),
                                   (d_1 - d_t).astype(dt)], axis=-1)
        he = jax.nn.silu(nn.Dense(c.n_hidden_edge_feats, dtype=dt,
                                  kernel_init=torch_uniform)(edge_in))
        he = jax.nn.silu(nn.Dense(c.n_hidden_edge_feats, dtype=dt,
                                  kernel_init=torch_uniform)(he))
        ef_out = constrain_pairs(ef_sym + he.astype(jnp.float32))  # symmetric residual
        return s_out, ef_out


class MolGVPNet(nn.Module):
    """Full endpoint-prediction network over a padded molecule batch."""

    cfg: VectorFieldConfig

    def setup(self):
        c = self.cfg
        nm = c.n_mask_feats

        # token embeddings (CTMC uses real embeddings; otherwise identity/one-hot)
        self.a_embed = (nn.Embed(c.n_atom_types + nm, c.a_token_dim,
                                 embedding_init=nn.initializers.normal(1.0))
                        if c.a_token_dim > 0 else None)
        self.c_embed = (nn.Embed(c.n_charges + nm, c.c_token_dim,
                                 embedding_init=nn.initializers.normal(1.0))
                        if c.c_token_dim > 0 else None)
        self.e_embed = (nn.Embed(c.n_bond_types + nm, c.e_token_dim,
                                 embedding_init=nn.initializers.normal(1.0))
                        if c.e_token_dim > 0 else None)

        self.scalar_embedding = _MLPLayerNorm(c.n_hidden_scalars)
        self.edge_embedding = _MLPLayerNorm(c.n_hidden_edge_feats)

        conv_cls = nn.remat(GVPConv, static_argnums=(9,)) if c.remat else GVPConv  # arg 0 is the module scope
        self.conv_layers = [
            conv_cls(
                scalar_size=c.n_hidden_scalars,
                vector_size=c.n_vec_channels,
                n_cp_feats=c.n_cp_feats,
                edge_feat_size=c.n_hidden_edge_feats,
                n_message_gvps=c.n_message_gvps,
                n_update_gvps=c.n_update_gvps,
                n_expansion_gvps=c.n_expansion_gvps,
                message_norm=c.message_norm,
                rbf_dmax=c.rbf_dmax,
                rbf_dim=c.rbf_dim,
                attention=c.attention,
                n_heads=c.n_heads,
                s_message_dim=c.s_message_dim,
                v_message_dim=c.v_message_dim,
                dropout=c.dropout,
                use_dst_feats=c.use_dst_feats,
                dst_feat_msg_reduction_factor=c.dst_feat_msg_reduction_factor,
                dtype=c.dtype,
            )
            for _ in range(c.convs_per_update * c.n_molecule_updates)
        ]

        n_updaters = c.n_molecule_updates if c.separate_mol_updaters else 1
        self.node_position_updaters = [
            NodePositionUpdate(c.n_hidden_scalars, c.n_vec_channels, n_gvps=3,
                               n_cp_feats=c.n_cp_feats)
            for _ in range(n_updaters)
        ]
        self.edge_updaters = [
            EdgeUpdate(c.n_hidden_scalars, c.n_hidden_edge_feats,
                       update_edge_w_distance=c.update_edge_w_distance,
                       rbf_dim=c.rbf_dim, dtype=c.dtype)
            for _ in range(n_updaters)
        ]

        self.node_output_head = _MLPHead(c.n_hidden_scalars,
                                         c.n_atom_types + c.n_charges)
        self.to_edge_logits = _MLPHead(c.n_hidden_edge_feats, c.n_bond_types,
                                       dtype=c.dtype)

        if c.self_conditioning:
            self.sc_residual = SelfConditioningResidual(c)

    # ------------------------------------------------------------------ embed
    def _embed(self, a_t, c_t, e_t, t, node_mask):
        """Token-embedding paths (a/c/e_token_dim > 0) accept EITHER float
        one-hot/simplex inputs (argmax'd to indices) or integer token arrays
        directly — the CTMC sampler passes tokens so no (B,N,N,K) one-hot is
        ever materialized on the scan's hot path."""
        c = self.cfg
        parts = []
        if self.a_embed is None:
            parts += [a_t, c_t]
        else:
            a_idx = a_t if a_t.ndim == 2 else jnp.argmax(a_t, -1)
            c_idx = c_t if c_t.ndim == 2 else jnp.argmax(c_t, -1)
            parts += [self.a_embed(a_idx), self.c_embed(c_idx)]
        bn = (parts[0].shape[0], parts[0].shape[1])
        if c.time_embedding_dim == 1:
            t_emb = t[:, None, None] * jnp.ones(bn + (1,))
        else:
            t_emb = time_embedding(t, c.time_embedding_dim)
            t_emb = jnp.broadcast_to(t_emb[:, None, :],
                                     bn + (c.time_embedding_dim,))
        parts.append(t_emb)
        s = self.scalar_embedding(jnp.concatenate(parts, axis=-1))

        if self.e_embed is None:
            ef = self.edge_embedding(e_t)
        else:
            # only K+1 distinct bond tokens exist: run the embedding MLP on
            # the (K+1, token_dim) table once and gather, instead of a
            # B*N^2-row matmul
            table = self.edge_embedding(self.e_embed.embedding)
            e_idx = e_t if e_t.ndim == 3 else jnp.argmax(e_t, -1)
            ef = table[e_idx]

        v = jnp.zeros(s.shape[:2] + (c.n_vec_channels, 3), dtype=s.dtype)
        s = s * node_validity(node_mask)[..., None]
        return s, v, constrain_pairs(ef)

    # ---------------------------------------------------------------- denoise
    def _denoise(self, s, v, x, ef, node_mask, apply_softmax, remove_com,
                 deterministic):
        c = self.cfg
        # `node_mask` may be a bool validity mask OR an int graph-id mask
        # (packed rows — several molecules share one padded row; see
        # flowmol_tpu.graphs.is_graph_ids).  The pair mask is block-diagonal
        # per molecule either way; everything downstream of it only ever
        # sees per-node/per-pair masked quantities.
        pair_mask = constrain_pairs(node_mask_to_pair_mask(node_mask))
        nm_valid = node_validity(node_mask)

        # the explicit-weight message path computes pairwise geometry
        # internally (fused with the first layer), so only materialize
        # x_diff/d here when something else consumes them
        explicit_msgs = (not c.attention and c.s_message_dim is None
                         and c.v_message_dim is None)

        def geometry(pos):
            if not explicit_msgs:
                xd, dd = pairwise_distances(pos, c.rbf_dmax, c.rbf_dim)
                return constrain_pairs(xd), constrain_pairs(dd)
            if c.update_edge_w_distance:
                return None, constrain_pairs(
                    pairwise_rbf(pos, c.rbf_dmax, c.rbf_dim))
            return None, None

        x_diff, d = geometry(x)

        for _ in range(c.n_recycles):
            for conv_idx, conv in enumerate(self.conv_layers):
                s, v = conv(s, v, ef, x, x_diff, d, pair_mask, node_mask,
                            deterministic)
                # reference trigger (vector_field.py:321): never after the
                # very first conv, then every convs_per_update convolutions
                if conv_idx != 0 and (conv_idx + 1) % c.convs_per_update == 0:
                    upd_idx = (conv_idx // c.convs_per_update
                               if c.separate_mol_updaters else 0)
                    x = self.node_position_updaters[upd_idx](s, x, v)
                    x = x * nm_valid[..., None]
                    x_diff, d = geometry(x)
                    ef = constrain_pairs(self.edge_updaters[upd_idx](s, ef, d))

        node_out = self.node_output_head(s)
        a_logits = node_out[..., :c.n_atom_types]
        c_logits = node_out[..., c.n_atom_types:]
        # symmetrize in the compute dtype: the head casts to c.dtype anyway,
        # and the f32 (B,N,N,128) transpose was a profiled hot spot
        ef_dt = ef.astype(c.dtype) if c.dtype else ef
        e_logits = self.to_edge_logits(ef_dt + jnp.swapaxes(ef_dt, 1, 2))

        if remove_com:
            x = graphs_remove_com(x, node_mask)

        dst = {"x": x, "a": a_logits, "c": c_logits, "e": e_logits}
        if apply_softmax:
            for f in ("a", "c", "e"):
                dst[f] = jax.nn.softmax(dst[f], axis=-1)
        return dst

    # -------------------------------------------------------------- bootstrap
    def bootstrap(self, x_t, a_t, c_t, e_t, t, node_mask):
        """Plain endpoint prediction without self-conditioning — used to
        produce the previous-endpoint estimate for the self-conditioning
        residual (the no-grad pass of vector_field.py:269-283)."""
        s, v, ef = self._embed(a_t, c_t, e_t, t, node_mask)
        return self._denoise(s, v, x_t, ef, node_mask, apply_softmax=True,
                             remove_com=False, deterministic=True)

    # ----------------------------------------------------------------- __call__
    def __call__(self, x_t, a_t, c_t, e_t, t, node_mask,
                 prev_dst: Optional[Dict[str, jnp.ndarray]] = None,
                 sc_apply_mask: Optional[jnp.ndarray] = None,
                 apply_softmax: bool = False, remove_com: bool = False,
                 deterministic: bool = True):
        """Predict the trajectory endpoint given the state at time t.

        x_t (B,N,3); a_t (B,N,Ka[+1]); c_t (B,N,Kc[+1]); e_t (B,N,N,Ke[+1]);
        t (B,); node_mask (B,N) bool.

        Self-conditioning protocol (parity with vector_field.py:264-289):
        if `self_conditioning` and `prev_dst is None`, an extra stop-gradient
        pass produces the previous-endpoint estimate; `sc_apply_mask` (B,) bool
        selects per molecule whether the self-conditioning residual is applied
        (the reference flips one coin per batch with P(apply)=1-scprop at train
        time; we flip per molecule — same marginal distribution).
        """
        c = self.cfg
        s, v, ef = self._embed(a_t, c_t, e_t, t, node_mask)

        if c.self_conditioning:
            if prev_dst is None:
                prev_dst = jax.lax.stop_gradient(
                    self._denoise(s, v, x_t, ef, node_mask,
                                  apply_softmax=True, remove_com=False,
                                  deterministic=deterministic))
            s_sc, ef_sc = self.sc_residual(s, x_t, ef, prev_dst, node_mask)
            if sc_apply_mask is not None:
                m_node = sc_apply_mask[:, None, None].astype(s.dtype)
                m_edge = sc_apply_mask[:, None, None, None].astype(ef.dtype)
                s = s_sc * m_node + s * (1 - m_node)
                ef = ef_sc * m_edge + ef * (1 - m_edge)
            else:
                s, ef = s_sc, ef_sc

        return self._denoise(s, v, x_t, ef, node_mask, apply_softmax,
                             remove_com, deterministic)


class _MLPLayerNorm(nn.Module):
    """Dense -> SiLU -> Dense -> SiLU -> LayerNorm (embedding MLPs)."""

    width: int

    @nn.compact
    def __call__(self, h):
        h = jax.nn.silu(_dense(self.width)(h))
        h = jax.nn.silu(_dense(self.width)(h))
        return nn.LayerNorm()(h)


class _MLPHead(nn.Module):
    """Dense -> SiLU -> Dense (output heads)."""

    width: int
    out: int
    dtype: object = None

    @nn.compact
    def __call__(self, h):
        h = jax.nn.silu(nn.Dense(self.width, dtype=self.dtype,
                                 kernel_init=torch_uniform)(h))
        return nn.Dense(self.out, dtype=self.dtype,
                        kernel_init=torch_uniform)(h).astype(jnp.float32)
