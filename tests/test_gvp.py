"""Equivariance and shape tests for the GVP stack.

The load-bearing invariant (which the reference never tested): scalar outputs
are invariant and vector outputs are equivariant under global rotation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.nn.embedding import norm_no_nan, rbf, time_embedding
from flowmol_tpu.nn.gvp import GVP, GVPConv, GVPLayerNorm, NodePositionUpdate
from flowmol_tpu.nn.vector_field import pairwise_distances


def random_rotation(key):
    # build in float64 numpy: float32 QR on the CPU backend leaves ~1e-3
    # orthogonality error, which would swamp the equivariance tolerance
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    a = np.random.default_rng(seed).standard_normal((3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diagonal(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return jnp.asarray(q.astype(np.float32))


def test_norm_no_nan_grad_at_zero():
    g = jax.grad(lambda x: norm_no_nan(x).sum())(jnp.zeros((4, 3)))
    assert np.isfinite(np.asarray(g)).all()


def test_rbf_shapes():
    d = jnp.linspace(0, 10, 7)
    out = rbf(d, d_max=10.0, d_count=16)
    assert out.shape == (7, 16)
    # center of first RBF is at d=0
    assert float(out[0, 0]) == pytest.approx(1.0)


def test_time_embedding_shape():
    emb = time_embedding(jnp.array([0.0, 0.5, 1.0]), 64)
    assert emb.shape == (3, 64)
    assert np.isfinite(np.asarray(emb)).all()


def test_gvp_equivariance():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, kr = jax.random.split(key, 4)
    s = jax.random.normal(k1, (5, 12))
    v = jax.random.normal(k2, (5, 8, 3))
    m = GVP(v_in=8, v_out=6, s_in=12, s_out=10, n_cp_feats=2)
    params = m.init(k3, (s, v))
    rot = random_rotation(kr)

    s1, v1 = m.apply(params, (s, v))
    s2, v2 = m.apply(params, (s, v @ rot.T))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1 @ rot.T), np.asarray(v2), atol=1e-5)


def test_gvp_layernorm_equivariance():
    key = jax.random.PRNGKey(1)
    s = jax.random.normal(key, (5, 12))
    v = jax.random.normal(jax.random.PRNGKey(2), (5, 8, 3))
    m = GVPLayerNorm()
    params = m.init(jax.random.PRNGKey(3), (s, v))
    rot = random_rotation(jax.random.PRNGKey(4))
    _, v1 = m.apply(params, (s, v))
    _, v2 = m.apply(params, (s, v @ rot.T))
    np.testing.assert_allclose(np.asarray(v1 @ rot.T), np.asarray(v2), atol=1e-5)


def _conv_inputs(key, B=2, N=6, Ds=16, Dv=4, De=8):
    ks = jax.random.split(key, 6)
    s = jax.random.normal(ks[0], (B, N, Ds))
    v = jax.random.normal(ks[1], (B, N, Dv, 3))
    x = jax.random.normal(ks[2], (B, N, 3))
    ef = jax.random.normal(ks[3], (B, N, N, De))
    node_mask = jnp.arange(N)[None, :] < jnp.array([[N], [N - 2]])[:, 0:1]
    return s, v, x, ef, node_mask


@pytest.mark.parametrize("attention,message_norm", [(False, "sum"), (True, 100.0)])
def test_gvpconv_equivariance(attention, message_norm):
    key = jax.random.PRNGKey(5)
    s, v, x, ef, node_mask = _conv_inputs(key)
    from flowmol_tpu.graphs import node_mask_to_pair_mask
    pair_mask = node_mask_to_pair_mask(node_mask)

    conv = GVPConv(scalar_size=16, vector_size=4, edge_feat_size=8,
                   n_message_gvps=2, n_update_gvps=1, attention=attention,
                   n_heads=2, message_norm=message_norm, rbf_dmax=10, rbf_dim=8)

    def run(xx, vv):
        x_diff, d = pairwise_distances(xx, 10, 8)
        return conv.apply(params, s, vv, ef, xx, x_diff, d, pair_mask, node_mask)

    x_diff, d = pairwise_distances(x, 10, 8)
    params = conv.init(jax.random.PRNGKey(6), s, v, ef, x, x_diff, d, pair_mask,
                       node_mask)
    rot = random_rotation(jax.random.PRNGKey(7))

    s1, v1 = run(x, v)
    s2, v2 = run(x @ rot.T, v @ rot.T)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v1 @ rot.T), np.asarray(v2), atol=2e-4)
    # padded nodes are zeroed
    assert float(jnp.abs(s1[1, -2:]).max()) == 0.0


def test_gvpconv_padding_independence():
    """Adding padding must not change real-node outputs."""
    key = jax.random.PRNGKey(8)
    s, v, x, ef, node_mask = _conv_inputs(key, B=1, N=6)
    node_mask = jnp.ones((1, 6), bool)
    conv = GVPConv(scalar_size=16, vector_size=4, edge_feat_size=8,
                   n_message_gvps=2, message_norm="sum", rbf_dmax=10, rbf_dim=8)
    from flowmol_tpu.graphs import node_mask_to_pair_mask

    def run(s_, v_, x_, ef_, nm):
        pm = node_mask_to_pair_mask(nm)
        x_diff, d = pairwise_distances(x_, 10, 8)
        return conv.apply(params, s_, v_, ef_, x_, x_diff, d, pm, nm)

    pm = node_mask_to_pair_mask(node_mask)
    x_diff, d = pairwise_distances(x, 10, 8)
    params = conv.init(jax.random.PRNGKey(9), s, v, ef, x, x_diff, d, pm, node_mask)

    s1, v1 = run(s, v, x, ef, node_mask)

    # pad to N=9 with garbage
    pad = lambda a, n: jnp.concatenate(
        [a, jnp.full((a.shape[0], n) + a.shape[2:], 7.7, a.dtype)], axis=1)
    s_p, v_p, x_p = pad(s, 3), pad(v, 3), pad(x, 3)
    ef_p = jnp.full((1, 9, 9, 8), 7.7).at[:, :6, :6, :].set(ef)
    nm_p = jnp.concatenate([node_mask, jnp.zeros((1, 3), bool)], axis=1)
    s2, v2 = run(s_p, v_p, x_p, ef_p, nm_p)

    np.testing.assert_allclose(np.asarray(s1[0]), np.asarray(s2[0, :6]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1[0]), np.asarray(v2[0, :6]), atol=1e-5)


def test_node_position_update_equivariance():
    key = jax.random.PRNGKey(10)
    s = jax.random.normal(key, (2, 5, 16))
    v = jax.random.normal(jax.random.PRNGKey(11), (2, 5, 4, 3))
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 5, 3))
    m = NodePositionUpdate(16, 4, n_gvps=3)
    params = m.init(jax.random.PRNGKey(13), s, x, v)
    rot = random_rotation(jax.random.PRNGKey(14))
    x1 = m.apply(params, s, x, v)
    x2 = m.apply(params, s, x @ rot.T, v @ rot.T)
    np.testing.assert_allclose(np.asarray(x1 @ rot.T), np.asarray(x2), atol=1e-5)
