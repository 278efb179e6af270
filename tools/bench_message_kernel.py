#!/usr/bin/env python
"""Microbenchmark: fused Pallas message kernel vs the XLA path, at the
flowmol3 message-stack spec, across sampling bucket sizes and tile shapes.

Usage: python tools/bench_message_kernel.py [--dev]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from flowmol_tpu.ops.pair_messages import MessageStackSpec, xla_message_agg
from flowmol_tpu.ops.pallas_messages import pallas_message_agg


def fm3_spec():
    from flowmol_tpu.nn.gvp import _message_stack_dims
    dims = _message_stack_dims(256, 32, 256, 32, 3, 0, 32, 128, 0, 0)
    return MessageStackSpec(
        s_msg=256, v_msg=32, s_dst=0, v_dst=0, rbf_dim=32, rbf_dmax=10.0,
        edge_feat_dim=128, n_cp_feats=4, dims=tuple(dims), message_norm="sum")


def make_weights(spec, rng):
    w = {}
    v_in0 = 1 + spec.v_msg + spec.v_dst
    h0 = spec.h0
    ncp = spec.n_cp_feats
    _, v0, _, s0 = spec.dims[0]
    def p(*shape):
        nonlocal rng
        rng, k = jax.random.split(rng)
        return jax.random.normal(k, shape, jnp.float32) * 0.05
    w["wh0"] = p(v_in0, h0)
    if ncp:
        w["wcp0"] = p(v_in0, 2 * ncp)
    w["wu0"] = p(h0 + ncp, v0)
    w["k_src"] = p(spec.s_msg, s0)
    w["k_edge"] = p(spec.rbf_dim + spec.edge_feat_dim, s0)
    if spec.s_dst:
        w["k_dst"] = p(spec.s_dst, s0)
    w["k_sh"] = p(h0 + ncp, s0)
    w["b0"] = p(s0)
    w["g0"] = p(s0, v0)
    w["gb0"] = p(v0)
    for li, (v_in, v_out, s_in, s_out) in enumerate(spec.dims[1:], start=1):
        h = max(v_in, v_out)
        w[f"wh{li}"] = p(v_in, h)
        if ncp:
            w[f"wcp{li}"] = p(v_in, 2 * ncp)
        w[f"wu{li}"] = p(h + ncp, v_out)
        w[f"k{li}"] = p(s_in + h + ncp, s_out)
        w[f"b{li}"] = p(s_out)
        w[f"g{li}"] = p(s_out, v_out)
        w[f"gb{li}"] = p(v_out)
    return w


def timeit(f, *args, iters=5, inner=300):
    """Time `f` by scanning it `inner` times inside one jit call (the tunneled
    TPU runtime has ~27ms per-dispatch latency, so per-op timing must
    amortize it).  A data dependency through the first arg's 'sc' input
    prevents loop-invariant hoisting."""
    sc = args[1]

    @jax.jit
    def loop(w, sc, vc, x, ef):
        def body(carry, _):
            s_agg, v_agg = f(w, carry, vc, x, ef)
            # feed aggregated scalars back in: real dependency, same shapes
            return carry + 1e-6 * s_agg, None
        carry, _ = jax.lax.scan(body, sc, None, length=inner)
        return carry

    out = jax.block_until_ready(f(*args))
    jax.block_until_ready(loop(*args))
    ts = []
    for i in range(iters):
        args2 = (args[0], sc + i * 1e-6) + args[2:]
        t0 = time.perf_counter()
        jax.block_until_ready(loop(*args2))
        ts.append(time.perf_counter() - t0)
    return min(ts) / inner, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    spec = fm3_spec()
    w = make_weights(spec, jax.random.PRNGKey(0))
    dt = jnp.bfloat16

    for B, N in [(64, 32), (41, 48), (64, 48), (32, 64), (16, 96), (8, 128)]:
        k = jax.random.PRNGKey(B * 1000 + N)
        ks = jax.random.split(k, 4)
        sc = jax.random.normal(ks[0], (B, N, spec.s_msg), jnp.float32)
        vc = jax.random.normal(ks[1], (B, N, spec.v_msg, 3), jnp.float32)
        x = jax.random.normal(ks[2], (B, N, 3), jnp.float32) * 3
        ef = jax.random.normal(ks[3], (B, N, N, spec.edge_feat_dim),
                               jnp.float32)
        node_mask = jnp.ones((B, N), bool)
        eye = jnp.eye(N, dtype=bool)[None]
        pair_mask = (node_mask[:, :, None] & node_mask[:, None, :]) & ~eye

        xla_fn = jax.jit(lambda w, sc, vc, x, ef: xla_message_agg(
            w, spec, sc, None, vc, None, x, ef, pair_mask, dtype=dt))
        t_xla, out_xla = timeit(xla_fn, w, sc, vc, x, ef, iters=args.iters)

        row = f"B={B:3d} N={N:3d}  xla={t_xla*1e3:7.2f}ms"
        for bi in [8, 16, 32]:
            if N % bi:
                continue
            try:
                pl_fn = jax.jit(lambda w, sc, vc, x, ef, _bi=bi:
                                pallas_message_agg(w, spec, sc, None, vc, None,
                                                   x, ef, node_mask, dtype=dt,
                                                   bi=_bi))
                t_pl, out_pl = timeit(pl_fn, w, sc, vc, x, ef, iters=args.iters)
                err = max(float(jnp.max(jnp.abs(out_pl[0] - out_xla[0]))),
                          float(jnp.max(jnp.abs(out_pl[1] - out_xla[1]))))
                row += f"  pl[{bi}]={t_pl*1e3:6.2f}ms(e{err:.1e})"
            except Exception as ex:
                row += f"  pl[{bi}]=FAIL({type(ex).__name__}:{str(ex)[:60]})"
        print(row, flush=True)


if __name__ == "__main__":
    main()
