"""Multi-molecule row packing: block-diagonal masks, per-molecule segment
math, and the packed sampling API.

Packing is the TPU answer to the reference's fragmented sampling dispatch
(/root/reference/test.py:99-133 batches by unique molecule size, so the
n=100 histogram draw runs as ~11 batches of size 1-27): several molecules
share one padded row, identified by a per-node graph-id mask
(flowmol_tpu.graphs.is_graph_ids), and the whole draw runs as 1-2 large
compiled dispatches.  These tests pin the invariant that makes packing
safe: a packed row computes EXACTLY what the same molecules compute in
separate rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.fm import ctmc
from flowmol_tpu.graphs import node_mask_to_pair_mask, remove_com
from flowmol_tpu.model import FlowMol
from tests.helpers import tiny_config

# compile-heavy: excluded from the fast gate (pyproject test tiers)
pytestmark = pytest.mark.heavy


# ---------------------------------------------------------------------------
# planner
# ---------------------------------------------------------------------------


def test_pack_sizes_partitions_every_molecule():
    from flowmol_tpu.api import pack_sizes
    rng = np.random.default_rng(0)
    sizes = rng.integers(3, 70, size=57)
    tiers, oversized = pack_sizes(sizes, capacities=(16, 32, 48))
    seen = sorted([i for _, rows in tiers for row in rows for i, _ in row] +
                  [i for i, _ in oversized])
    assert seen == list(range(len(sizes)))
    for cap, rows in tiers:
        for row in rows:
            assert sum(s for _, s in row) <= cap
            for i, s in row:
                assert s == sizes[i] and s <= cap
    # ONLY molecules bigger than every capacity may fall back
    for i, s in oversized:
        assert s == sizes[i] and s > 48


def test_pack_sizes_respects_max_graphs_per_row():
    from flowmol_tpu.api import pack_sizes
    sizes = [2] * 40
    tiers, oversized = pack_sizes(sizes, capacities=(64,),
                                  max_graphs_per_row=4)
    assert not oversized
    assert all(len(row) <= 4 for _, rows in tiers for row in rows)


def test_pack_sizes_tiers_bimodal_draw():
    """A bimodal size draw (many smalls + a large tail) must produce a
    tiered plan with NO bucket fallback for sizes within the capacity range
    — the round-2 single-capacity planner sent the tail through toy-batch
    bucket dispatches (VERDICT r2: 51/100 oversized, 0.07% MFU)."""
    from flowmol_tpu.api import pack_sizes
    rng = np.random.default_rng(1)
    sizes = np.concatenate([rng.integers(20, 60, 80),
                            rng.integers(100, 181, 20)])
    tiers, oversized = pack_sizes(sizes)  # default GEOM capacities
    assert not oversized
    packed = sum(len(row) for _, rows in tiers for row in rows)
    assert packed == 100
    # the large tail must land in large-capacity rows
    assert max(cap for cap, _ in tiers) >= 181
    # gap-filling keeps rows reasonably full: total padded slots within 2x
    # of the true atom count
    padded = sum(len(rows) * cap for cap, rows in tiers)
    assert padded <= 2 * sizes.sum()


# ---------------------------------------------------------------------------
# mask helpers under graph-id masks
# ---------------------------------------------------------------------------

# one row, molecules of sizes 3 and 4, one padding slot
GIDS = jnp.array([[0, 0, 0, 1, 1, 1, 1, -1]], jnp.int32)


def test_pair_mask_is_block_diagonal():
    pm = np.asarray(node_mask_to_pair_mask(GIDS))[0]
    expect = np.zeros((8, 8), bool)
    expect[:3, :3] = True
    expect[3:7, 3:7] = True
    np.fill_diagonal(expect, False)
    np.testing.assert_array_equal(pm, expect)


def test_upper_valid_and_segment_ids():
    up = np.asarray(ctmc.upper_valid_mask(GIDS))[0]
    seg = np.asarray(ctmc.upper_segment_ids(GIDS))[0]
    iu, ju = np.triu_indices(8, 1)
    g = np.asarray(GIDS)[0]
    expect_valid = (g[iu] == g[ju]) & (g[iu] >= 0)
    np.testing.assert_array_equal(up, expect_valid)
    np.testing.assert_array_equal(seg, np.where(expect_valid, g[iu], -1))


def test_remove_com_packed_matches_separate():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 3)).astype(np.float32)
    out = np.asarray(remove_com(jnp.asarray(x), GIDS))[0]
    # per-molecule CoM removal
    m0 = x[0, :3] - x[0, :3].mean(0)
    m1 = x[0, 3:7] - x[0, 3:7].mean(0)
    np.testing.assert_allclose(out[:3], m0, atol=1e-6)
    np.testing.assert_allclose(out[3:7], m1, atol=1e-6)
    # padding slots untouched
    np.testing.assert_allclose(out[7], x[0, 7], atol=1e-6)


def test_purity_probs_packed_matches_per_molecule_oracle():
    """The segment budget math must equal running each molecule alone."""
    rng = np.random.default_rng(2)
    K, mask_idx = 4, 4
    xt = jnp.asarray(rng.integers(0, 5, size=(1, 8)), jnp.int32)
    p1 = jnp.asarray(rng.dirichlet(np.ones(K), size=(1, 8)), jnp.float32)
    unmask_prob = jnp.asarray(0.37)
    packed = ctmc.purity_probs(
        xt, p1, unmask_prob, mask_idx, GIDS >= 0, hc_thresh=0.5,
        segment_ids=GIDS, n_segments=2)

    # oracle: each molecule in its own row through the classic path
    for sl, gid in ((slice(0, 3), 0), (slice(3, 7), 1)):
        alone = ctmc.purity_probs(
            xt[:, sl], p1[:, sl], unmask_prob, mask_idx,
            jnp.ones((1, sl.stop - sl.start), bool), hc_thresh=0.5)
        np.testing.assert_allclose(np.asarray(packed[0, sl]),
                                   np.asarray(alone[0]), atol=1e-6)
    assert float(packed[0, 7]) == 0.0  # padding never unmasked


def test_purity_probs_single_segment_matches_classic():
    """graph-ids all-zero == the classic one-molecule-per-row path."""
    rng = np.random.default_rng(3)
    K, mask_idx = 5, 5
    xt = jnp.asarray(rng.integers(0, 6, size=(2, 9)), jnp.int32)
    p1 = jnp.asarray(rng.dirichlet(np.ones(K), size=(2, 9)), jnp.float32)
    up = jnp.asarray(0.21)
    valid = jnp.ones((2, 9), bool)
    classic = ctmc.purity_probs(xt, p1, up, mask_idx, valid, hc_thresh=0.8)
    seg = jnp.zeros((2, 9), jnp.int32)
    packed = ctmc.purity_probs(xt, p1, up, mask_idx, valid, hc_thresh=0.8,
                               segment_ids=seg, n_segments=1)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(classic),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# network forward: packed row == separate rows
# ---------------------------------------------------------------------------

SIZES = (5, 7)
N = sum(SIZES)


def _forward_inputs(cfg, rng_seed=0):
    """Random per-molecule inputs + their packed and separate layouts."""
    rng = np.random.default_rng(rng_seed)
    ka, kc, ke = cfg.n_atom_types, cfg.n_atom_charges, cfg.n_bond_types
    km = 1 if cfg.discrete_cats else 0
    mols = []
    for s in SIZES:
        x = rng.standard_normal((s, 3)).astype(np.float32)
        a = rng.integers(0, ka + km, s).astype(np.int32)
        c = rng.integers(0, kc + km, s).astype(np.int32)
        e = rng.integers(0, ke + km, (s, s)).astype(np.int32)
        e = np.triu(e, 1)
        e = e + e.swapaxes(0, 1)
        mols.append((x, a, c, e))

    if cfg.discrete_cats:
        def cat(v, k):
            return v
    else:
        def cat(v, k):
            return jax.nn.one_hot(v, k)

    # separate rows: B=2, padded to N
    xs = np.zeros((2, N, 3), np.float32)
    as_ = np.zeros((2, N), np.int32)
    cs = np.zeros((2, N), np.int32)
    es = np.zeros((2, N, N), np.int32)
    nm = np.zeros((2, N), bool)
    for b, (x, a, c, e) in enumerate(mols):
        s = SIZES[b]
        xs[b, :s], as_[b, :s], cs[b, :s], es[b, :s, :s] = x, a, c, e
        nm[b, :s] = True

    # packed: B=1, molecules contiguous
    xp = np.zeros((1, N, 3), np.float32)
    ap = np.zeros((1, N), np.int32)
    cp = np.zeros((1, N), np.int32)
    ep = np.zeros((1, N, N), np.int32)
    gids = np.full((1, N), -1, np.int32)
    off = 0
    for g, (x, a, c, e) in enumerate(mols):
        s = SIZES[g]
        xp[0, off:off + s], ap[0, off:off + s] = x, a
        cp[0, off:off + s], ep[0, off:off + s, off:off + s] = c, e
        gids[0, off:off + s] = g
        off += s

    sep = (jnp.asarray(xs), cat(jnp.asarray(as_), ka + km),
           cat(jnp.asarray(cs), kc + km), cat(jnp.asarray(es), ke + km),
           jnp.asarray(nm))
    pack = (jnp.asarray(xp), cat(jnp.asarray(ap), ka + km),
            cat(jnp.asarray(cp), kc + km), cat(jnp.asarray(ep), ke + km),
            jnp.asarray(gids))
    return sep, pack


@pytest.mark.parametrize("parameterization", ["ctmc", "endpoint"])
def test_packed_forward_matches_separate(parameterization):
    cfg = tiny_config(parameterization=parameterization)
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    (xs, as_, cs, es, nm), (xp, ap, cp, ep, gids) = _forward_inputs(cfg)

    out_sep = model.net.apply(params, xs, as_, cs, es,
                              jnp.full((2,), 0.3), nm,
                              apply_softmax=True, remove_com=True,
                              deterministic=True)
    out_pack = model.net.apply(params, xp, ap, cp, ep,
                               jnp.full((1,), 0.3), gids,
                               apply_softmax=True, remove_com=True,
                               deterministic=True)

    slices = [(0, slice(0, 5)), (1, slice(5, 12))]
    for feat in ("x", "a", "c"):
        for b, sl in slices:
            s = SIZES[b]
            np.testing.assert_allclose(
                np.asarray(out_pack[feat][0, sl]),
                np.asarray(out_sep[feat][b, :s]),
                atol=2e-4, rtol=2e-4,
                err_msg=f"{feat} molecule {b}")
    for b, sl in slices:
        s = SIZES[b]
        np.testing.assert_allclose(
            np.asarray(out_pack["e"][0, sl, sl]),
            np.asarray(out_sep["e"][b, :s, :s]),
            atol=2e-4, rtol=2e-4, err_msg=f"e molecule {b}")


# ---------------------------------------------------------------------------
# end-to-end packed sampling
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("parameterization", ["ctmc", "endpoint"])
def test_packed_integrate_unmasks_everything(parameterization):
    cfg = tiny_config(parameterization=parameterization,
                      self_conditioning=(parameterization == "ctmc"))
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    gids = jnp.array([[0, 0, 0, 1, 1, 1, 1, -1],
                      [0, 0, 0, 0, 0, 0, -1, -1]], jnp.int32)
    fn = jax.jit(model.make_sample_fn(n_timesteps=6, n_graphs_per_row=2))
    final = fn(params, jax.random.PRNGKey(4), gids)
    assert np.isfinite(np.asarray(final["x"])).all()
    if parameterization == "ctmc":
        a = np.asarray(final["a"])
        valid = np.asarray(gids) >= 0
        assert (a[valid] < cfg.n_atom_types).all(), "mask tokens survived"
        up_valid = np.asarray(ctmc.upper_valid_mask(gids))
        e = np.asarray(final["e_up"])
        assert (e[up_valid] <= cfg.n_bond_types).all()
    # padded positions zeroed
    assert np.abs(np.asarray(final["x"])[np.asarray(gids) < 0]).max() == 0.0


def test_packed_sample_returns_input_order():
    from flowmol_tpu.api import packed_sample
    cfg = tiny_config(parameterization="ctmc")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    # 20 > capacity 16 -> oversized path; the rest pack
    sizes = np.array([5, 20, 3, 7, 4, 6])
    out = packed_sample(model, params, sizes, seed=11, n_timesteps=5,
                        capacities=(16,))
    assert len(out) == len(sizes)
    for s, mol in zip(sizes, out):
        assert mol["x"].shape == (s, 3)
        assert mol["a"].shape == (s,)
        assert mol["c"].shape == (s,)
        assert mol["e"].shape == (s, s)
        assert (mol["a"] < cfg.n_atom_types).all()
        assert (mol["e"] <= cfg.n_bond_types).all()
        np.testing.assert_array_equal(mol["e"], mol["e"].T)

    # deterministic for a fixed seed
    out2 = packed_sample(model, params, sizes, seed=11, n_timesteps=5,
                         capacities=(16,))
    for m1, m2 in zip(out, out2):
        np.testing.assert_allclose(m1["x"], m2["x"], atol=1e-6)
        np.testing.assert_array_equal(m1["a"], m2["a"])


def test_packed_sample_continuous_param():
    from flowmol_tpu.api import packed_sample
    cfg = tiny_config(parameterization="endpoint")
    model = FlowMol(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    sizes = np.array([4, 5, 6])
    out = packed_sample(model, params, sizes, seed=3, n_timesteps=5,
                        capacities=(16,))
    assert len(out) == 3
    for s, mol in zip(sizes, out):
        assert mol["x"].shape == (s, 3)
        assert mol["e"].shape == (s, s)
        assert np.isfinite(mol["x"]).all()


def test_plan_pack_tiers_covers_oversized():
    """plan_pack_tiers is the single dispatch planner: molecules above every
    configured capacity get ad-hoc mod-8 tiers instead of a bucket fallback
    (round-5 dispatch unification)."""
    from flowmol_tpu.api import plan_pack_tiers
    sizes = [5, 30, 45, 60, 70, 90, 203, 210]
    tiers = plan_pack_tiers(sizes, capacities=(16, 32, 48, 64))
    seen = sorted(i for _, rows in tiers for row in rows for i, _ in row)
    assert seen == list(range(len(sizes)))
    for cap, rows in tiers:
        for row in rows:
            assert sum(s for _, s in row) <= cap
    # every molecule above the largest configured capacity (64) gets an
    # ad-hoc tier at its own mod-8 padded size
    ad_hoc = [(cap, rows) for cap, rows in tiers if cap > 64]
    assert {cap for cap, _ in ad_hoc} == {72, 96, 208, 216}
    assert sorted(s for _, rows in ad_hoc for row in rows
                  for _, s in row) == [70, 90, 203, 210]
    # tiers are sorted largest capacity first
    assert [c for c, _ in tiers] == sorted(
        (c for c, _ in tiers), reverse=True)
