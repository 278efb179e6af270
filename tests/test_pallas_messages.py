"""Fused Pallas message kernel vs the XLA reference path (same weights).

Runs the kernel in interpreter mode on CPU so the equivalence is testable
without a TPU; the real-hardware speed comparison lives in bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from flowmol_tpu.graphs import node_mask_to_pair_mask
from flowmol_tpu.ops import pallas_messages
from flowmol_tpu.ops.pair_messages import (MessageStackSpec, init_weights,
                                           xla_message_agg)

# compile-heavy: excluded from the fast gate (pyproject test tiers)
pytestmark = pytest.mark.heavy


def _setup(ncp=2, dst=True, B=2, N=32, s_msg=16, v_msg=4, de=8):
    dims = ((1 + v_msg + (2 if dst else 0), 6, 0, s_msg),
            (6, 4, s_msg, s_msg))
    spec = MessageStackSpec(
        s_msg=s_msg, v_msg=v_msg, s_dst=(4 if dst else 0),
        v_dst=(2 if dst else 0), rbf_dim=8, rbf_dmax=10.0, edge_feat_dim=de,
        n_cp_feats=ncp, dims=dims, message_norm="sum")

    # build weights through a tiny flax shim so shapes match init_weights
    from flax import linen as nn

    from flowmol_tpu.nn.gvp import torch_uniform

    class Shim(nn.Module):
        @nn.compact
        def __call__(self):
            return init_weights(self, spec, torch_uniform)

    shim = Shim()
    variables = shim.init(jax.random.PRNGKey(0))
    w = shim.apply(variables)

    ks = jax.random.split(jax.random.PRNGKey(1), 7)
    sc = jax.random.normal(ks[0], (B, N, s_msg))
    vc = jax.random.normal(ks[1], (B, N, v_msg, 3))
    x = jax.random.normal(ks[2], (B, N, 3)) * 2.0
    ef = jax.random.normal(ks[3], (B, N, N, de))
    ef = 0.5 * (ef + jnp.swapaxes(ef, 1, 2))
    s_dst = jax.random.normal(ks[4], (B, N, 4)) if dst else None
    v_dst = jax.random.normal(ks[5], (B, N, 2, 3)) if dst else None
    node_mask = jnp.arange(N)[None, :] < jnp.array([N, N - 5])[:, None]
    return spec, w, sc, s_dst, vc, v_dst, x, ef, node_mask


# N=24/40 cover non-power-of-two buckets, N=200 covers the ad-hoc >192
# fallback bucket, N=20 forces the bi-reduction path (8 -> 4)
@pytest.mark.parametrize("ncp,dst,N", [(0, False, 32), (2, True, 32),
                                       (2, True, 24), (0, False, 40),
                                       (2, True, 200), (0, False, 20)])
def test_pallas_matches_xla(ncp, dst, N, monkeypatch):
    spec, w, sc, s_dst, vc, v_dst, x, ef, node_mask = _setup(ncp=ncp, dst=dst,
                                                             N=N)
    pair_mask = node_mask_to_pair_mask(node_mask)

    ref_s, ref_v = xla_message_agg(w, spec, sc, s_dst, vc, v_dst, x, ef,
                                   pair_mask, dtype=jnp.float32)

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pallas_messages.pl, "pallas_call", interp_call)
    out_s, out_v = pallas_messages.pallas_message_agg(
        w, spec, sc, s_dst, vc, v_dst, x, ef, node_mask,
        dtype=jnp.float32, bi=8)

    np.testing.assert_allclose(np.asarray(ref_s), np.asarray(out_s),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ref_v), np.asarray(out_v),
                               atol=5e-4, rtol=1e-3)


def test_pallas_rejects_mean_norm():
    spec, w, sc, s_dst, vc, v_dst, x, ef, node_mask = _setup(ncp=0, dst=False)
    import dataclasses
    spec = dataclasses.replace(spec, message_norm="mean")
    with pytest.raises(NotImplementedError):
        pallas_messages.pallas_message_agg(w, spec, sc, None, vc, None, x, ef,
                                           node_mask)
