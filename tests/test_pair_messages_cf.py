"""Channels-first message stack == reference-layout stack (same weights).

The CF path (flowmol_tpu/ops/pair_messages.py::xla_message_agg_cf) is a pure
physical-layout rewrite; this pins its math to `xla_message_agg` in f32,
including masked pads, cp features, dst features and message_norm='mean'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.ops.pair_messages import (MessageStackSpec, xla_message_agg,
                                           xla_message_agg_cf)


def _rand_weights(rng, spec):
    w = {}
    v_in0 = 1 + spec.v_msg + spec.v_dst
    h0 = spec.h0
    ncp = spec.n_cp_feats
    _, v0_out, _, s0_out = spec.dims[0]

    def mk(*shape):
        nonlocal rng
        rng, k = jax.random.split(rng)
        return jax.random.normal(k, shape, jnp.float32) * 0.2

    w["wh0"] = mk(v_in0, h0)
    if ncp:
        w["wcp0"] = mk(v_in0, 2 * ncp)
    w["wu0"] = mk(h0 + ncp, v0_out)
    w["k_src"] = mk(spec.s_msg, s0_out)
    w["k_edge"] = mk(spec.rbf_dim + spec.edge_feat_dim, s0_out)
    if spec.s_dst:
        w["k_dst"] = mk(spec.s_dst, s0_out)
    w["k_sh"] = mk(h0 + ncp, s0_out)
    w["b0"] = mk(s0_out)
    w["g0"] = mk(s0_out, v0_out)
    w["gb0"] = mk(v0_out)
    for li, (v_in, v_out, s_in, s_out) in enumerate(spec.dims[1:], start=1):
        h = max(v_in, v_out)
        w[f"wh{li}"] = mk(v_in, h)
        if ncp:
            w[f"wcp{li}"] = mk(v_in, 2 * ncp)
        w[f"wu{li}"] = mk(h + ncp, v_out)
        w[f"k{li}"] = mk(s_in + h + ncp, s_out)
        w[f"b{li}"] = mk(s_out)
        w[f"g{li}"] = mk(s_out, v_out)
        w[f"gb{li}"] = mk(v_out)
    return w


@pytest.mark.parametrize("norm,ncp,dst", [
    ("sum", 4, 0), ("mean", 0, 8), (10.0, 2, 0),
])
def test_cf_matches_pair_minor(norm, ncp, dst):
    B, N, S, V = 3, 16, 24, 6
    dims = ((1 + V + (dst and V // 2), S, S + 8 + 5 + (dst and S // 2), S),
            (S, V, S, S))
    spec = MessageStackSpec(
        s_msg=S, v_msg=V, s_dst=(S // 2 if dst else 0),
        v_dst=(V // 2 if dst else 0), rbf_dim=8, rbf_dmax=10.0,
        edge_feat_dim=5, n_cp_feats=ncp,
        dims=((1 + V + (V // 2 if dst else 0), S,
               S + 8 + 5 + (S // 2 if dst else 0), S), (S, V, S, S)),
        message_norm=norm)
    w = _rand_weights(jax.random.PRNGKey(0), spec)

    r = np.random.default_rng(1)
    sc = jnp.asarray(r.standard_normal((B, N, S)), jnp.float32)
    vc = jnp.asarray(r.standard_normal((B, N, V, 3)), jnp.float32)
    x = jnp.asarray(r.standard_normal((B, N, 3)) * 3, jnp.float32)
    ef = jnp.asarray(r.standard_normal((B, N, N, 5)), jnp.float32)
    s_dst = v_dst = None
    if dst:
        s_dst = jnp.asarray(r.standard_normal((B, N, S // 2)), jnp.float32)
        v_dst = jnp.asarray(r.standard_normal((B, N, V // 2, 3)), jnp.float32)
    # ragged validity -> pair mask with pads
    nm = jnp.arange(N)[None, :] < jnp.asarray([N, N - 5, 7])[:, None]
    pair_mask = nm[:, :, None] & nm[:, None, :] & ~jnp.eye(N, dtype=bool)[None]

    a_s, a_v = jax.jit(xla_message_agg, static_argnums=(1, 9))(
        w, spec, sc, s_dst, vc, v_dst, x, ef, pair_mask, jnp.float32)
    b_s, b_v = jax.jit(xla_message_agg_cf, static_argnums=(1, 9))(
        w, spec, sc, s_dst, vc, v_dst, x, ef, pair_mask, jnp.float32)

    assert a_s.shape == b_s.shape and a_v.shape == b_v.shape
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(b_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_v), np.asarray(b_v),
                               rtol=2e-5, atol=2e-5)
