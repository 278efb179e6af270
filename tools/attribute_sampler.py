#!/usr/bin/env python
"""Attribute sampler device time per HLO op (VERDICT r3 item 1).

Traces a short packed-sampler run with jax.profiler, converts the xplane
with xprof's hlo_stats tool, and prints the top ops by self time plus a
category rollup (matmul / transpose-copy / elementwise / reduce / other).

Usage:
    python tools/attribute_sampler.py [--batch 43 --cap 64 --steps 10]
        [--forward_only] [--out artifacts/attribution.json]
"""

import argparse
import glob
import json
import os
import re
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/flowmol3.yml")
    ap.add_argument("--batch", type=int, default=43)
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--forward_only", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowmol_tpu.api import model_from_config, read_config_file

    config = read_config_file(args.config)
    model = model_from_config(config)
    params = model.init_params(jax.random.PRNGKey(0))
    B, N = args.batch, args.cap
    node_mask = jnp.ones((B, N), bool)
    rng = jax.random.PRNGKey(1)

    if args.forward_only:
        cfg = model.cfg
        # mirror FlowMol.init_params (model.py): masked-prior configs carry
        # one mask class even when n_mask_feats is 0
        km = cfg.vf.n_mask_feats or int(cfg.cat_prior_masked)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal((B, N, 3)), jnp.float32)
        a = jax.nn.one_hot(r.integers(0, cfg.n_atom_types, (B, N)),
                           cfg.n_atom_types + km)
        c = jax.nn.one_hot(r.integers(0, cfg.n_atom_charges, (B, N)),
                           cfg.n_atom_charges + km)
        e = jax.nn.one_hot(r.integers(0, cfg.n_bond_types, (B, N, N)),
                           cfg.n_bond_types + km)
        t = jnp.full((B,), 0.5)
        fn = jax.jit(lambda p: model.net.apply(
            p, x, a, c, e, t, node_mask, apply_softmax=True,
            remove_com=True, deterministic=True))
        label = f"forward B={B} N={N}"
    else:
        sf = model.make_sample_fn(n_timesteps=args.steps)
        fn = jax.jit(lambda p: sf(p, rng, node_mask))
        label = f"sample B={B} N={N} T={args.steps}"

    jax.block_until_ready(fn(params))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(fn(params))
    wall = time.perf_counter() - t0

    tdir = tempfile.mkdtemp(prefix="fm_attr_")
    with jax.profiler.trace(tdir):
        jax.block_until_ready(fn(params))

    paths = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane produced under {tdir} — axon profiler "
                         "unsupported?")

    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    js = json.loads(data)
    # hlo_stats gtable json: rows of [rank, program, hlo name, category,
    # ... occurrences, total time, avg time, total self time ...]
    cols = [c["label"] if isinstance(c, dict) else c
            for c in js.get("cols", [])]
    rows = js.get("rows", [])

    def cell(row, i):
        v = row["c"][i]
        return None if v is None else v.get("v")

    idx = {lab: i for i, lab in enumerate(cols)}
    name_i = next((idx[k] for k in idx if "HLO" in k and "ame" in k), 2)
    cat_i = next((idx[k] for k in idx if "ategor" in k), 3)
    self_us_i = next((idx[k] for k in idx
                      if "self" in k.lower() and "us" in k.lower()), None)
    if self_us_i is None:
        # fail loudly rather than attribute against a guessed column — a
        # schema change would otherwise produce plausible-but-wrong output
        raise SystemExit(
            "hlo_stats gtable has no 'self ... (us)' column; columns were: "
            f"{cols} — update the column discovery in this tool")

    ops = []
    dropped = 0
    for r_ in rows:
        try:
            ops.append({"name": cell(r_, name_i),
                        "category": cell(r_, cat_i),
                        "self_us": float(cell(r_, self_us_i) or 0.0)})
        except Exception:
            dropped += 1
    if dropped:
        print(f"WARNING: {dropped}/{len(rows)} hlo_stats rows unparseable "
              "and excluded from the attribution")
    ops.sort(key=lambda o: -o["self_us"])
    total_us = sum(o["self_us"] for o in ops)

    def bucket(o):
        c = (o["category"] or "").lower()
        n = (o["name"] or "").lower()
        if "convolution" in c or "dot" in c or "matmul" in c or \
                re.match(r"^(dot|conv)", n):
            return "matmul"
        if "copy" in c or "transpose" in c or \
                re.match(r"^(copy|transpose|bitcast)", n):
            return "copy/transpose"
        if "fusion" in c or "fusion" in n:
            return "fusion(elementwise)"
        if "reduce" in c or re.match(r"^reduce", n):
            return "reduce"
        if "rng" in n or "rng" in c:
            return "rng"
        return "other"

    roll = {}
    for o in ops:
        roll[bucket(o)] = roll.get(bucket(o), 0.0) + o["self_us"]

    print(f"== {label}  wall={wall * 1e3:.1f}ms  "
          f"device_total={total_us / 1e3:.1f}ms ==")
    print("-- category rollup --")
    for k, v in sorted(roll.items(), key=lambda kv: -kv[1]):
        print(f"  {k:22s} {v / 1e3:9.2f} ms  {100 * v / max(total_us, 1):5.1f}%")
    print(f"-- top {args.top} ops by self time --")
    for o in ops[:args.top]:
        print(f"  {o['self_us'] / 1e3:9.3f} ms  {o['category']:18s} "
              f"{o['name'][:110]}")

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"label": label, "wall_s": wall,
                       "device_total_ms": total_us / 1e3,
                       "rollup_ms": {k: v / 1e3 for k, v in roll.items()},
                       "top_ops": ops[:100]}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
