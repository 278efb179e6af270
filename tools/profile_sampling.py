#!/usr/bin/env python
"""Profile the 250-step sampling path: per-bucket wall time, XLA FLOP
estimates, and achieved MXU utilization on the current chip.

Usage:
    python tools/profile_sampling.py [--bucket N --batch B] [--trace DIR]

With --trace, writes a jax.profiler trace viewable in xprof/tensorboard.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from flowmol_tpu.api import model_from_config, read_config_file

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/flowmol3.yml")
    ap.add_argument("--bucket", type=int, default=48)
    ap.add_argument("--batch", type=int, default=41)
    ap.add_argument("--n_timesteps", type=int, default=250)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--forward_only", action="store_true")
    args = ap.parse_args()

    config = read_config_file(args.config)
    model = model_from_config(config)
    params = model.init_params(jax.random.PRNGKey(0))
    B, N = args.batch, args.bucket

    node_mask = jnp.ones((B, N), bool)
    rng = jax.random.PRNGKey(1)

    # --- full integrate -----------------------------------------------------
    fn = jax.jit(model.make_sample_fn(n_timesteps=args.n_timesteps))
    lowered = fn.lower(params, rng, node_mask)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = ca.get("flops", 0.0) if ca else 0.0

    out = jax.block_until_ready(fn(params, rng, node_mask))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(params, rng, node_mask))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    tflops_s = flops / dt / 1e12
    print(f"integrate B={B} N={N} T={args.n_timesteps}: {dt:.3f}s "
          f"({B / dt:.2f} mols/s)  xla_flops={flops / 1e12:.2f} TF  "
          f"achieved={tflops_s:.1f} TFLOP/s "
          f"({100 * tflops_s / V5E_BF16_PEAK_TFLOPS:.1f}% of v5e bf16 peak)")

    # --- single denoiser forward --------------------------------------------
    cfg = model.cfg
    km = 1 if cfg.is_ctmc else 0
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, N, 3)), jnp.float32)
    a = jax.nn.one_hot(r.integers(0, cfg.n_atom_types, (B, N)),
                       cfg.n_atom_types + km)
    c = jax.nn.one_hot(r.integers(0, cfg.n_atom_charges, (B, N)),
                       cfg.n_atom_charges + km)
    e = jax.nn.one_hot(r.integers(0, cfg.n_bond_types, (B, N, N)),
                       cfg.n_bond_types + km)
    t = jnp.full((B,), 0.5)

    def fwd(params, x, a, c, e, t):
        return model.net.apply(params, x, a, c, e, t, node_mask,
                               apply_softmax=True, remove_com=True)

    ffn = jax.jit(fwd)
    fca = ffn.lower(params, x, a, c, e, t).compile().cost_analysis()
    fflops = fca.get("flops", 0.0) if fca else 0.0
    jax.block_until_ready(ffn(params, x, a, c, e, t))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(ffn(params, x, a, c, e, t))
        ts.append(time.perf_counter() - t0)
    fdt = min(ts)
    ftf = fflops / fdt / 1e12
    print(f"forward   B={B} N={N}: {fdt * 1e3:.2f}ms  "
          f"xla_flops={fflops / 1e9:.2f} GF  achieved={ftf:.1f} TFLOP/s "
          f"({100 * ftf / V5E_BF16_PEAK_TFLOPS:.1f}% of peak)  "
          f"step_overhead={(dt - args.n_timesteps * fdt) / args.n_timesteps * 1e3:.2f}"
          f"ms/step (integrate minus forward)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(fn(params, rng, node_mask))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
