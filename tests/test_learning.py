"""End-to-end learning anchor: a tiny CTMC model trained on a handful of
saturated synthetic molecules must markedly improve sampled chemistry over an
untrained model.

This is the regression class no unit test catches: every component can be
individually correct while a train/sample mismatch (loss targets, conditional
path, integration) silently caps sample quality.  The reference has no such
test (SURVEY.md §4); its equivalent was eyeballing in-training wandb curves.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.analysis.metrics import SampleAnalyzer
from flowmol_tpu.analysis.molecule_builder import molecules_from_sampled_state
from flowmol_tpu.data.dataset import DataConfig, pad_batch, prepare_molecule
from flowmol_tpu.data.synthetic import generate_molecule
from flowmol_tpu.model import FlowMol
from flowmol_tpu.train_utils.optim import LRScheduleConfig
from flowmol_tpu.train_utils.step import create_train_state, make_train_step

from .helpers import tiny_config

# compile-heavy: excluded from the fast gate (pyproject test tiers)
pytestmark = pytest.mark.heavy


CTMC_PRIOR = {
    "x": {"align": True, "type": "centered-normal", "kwargs": {"std": 1.0}},
    "a": {"align": False, "type": "ctmc", "kwargs": {}},
    "c": {"align": False, "type": "ctmc", "kwargs": {}},
    "e": {"align": False, "type": "ctmc", "kwargs": {}},
}

# FlowMol1-style simplex priors for the continuous parameterizations
# (reference priors.py:244-264; uniform-simplex is the Dirichlet(1) prior)
SIMPLEX_PRIOR = {
    "x": {"align": True, "type": "centered-normal", "kwargs": {"std": 1.0}},
    "a": {"align": False, "type": "uniform-simplex", "kwargs": {}},
    "c": {"align": False, "type": "uniform-simplex", "kwargs": {}},
    "e": {"align": False, "type": "uniform-simplex", "kwargs": {}},
}

N_PAD = 12


def _sample_metrics(model, params, sizes, seed=99):
    fn = jax.jit(model.make_sample_fn(n_timesteps=50))
    nm = np.arange(N_PAD)[None, :] < sizes[:, None]
    out = jax.tree.map(np.asarray,
                       fn(params, jax.random.PRNGKey(seed), jnp.asarray(nm)))
    mols = molecules_from_sampled_state(out, nm, model.cfg.atom_type_map,
                                        ctmc_mol=model.cfg.is_ctmc)
    return SampleAnalyzer().analyze(mols)


@pytest.mark.slow
def test_ctmc_training_improves_sampled_chemistry():
    cfg = tiny_config()
    model = FlowMol(cfg)
    dc = DataConfig(prior_config=CTMC_PRIOR, n_atom_types=cfg.n_atom_types,
                    n_bond_types=cfg.n_bond_types, fake_atom_p=0.0,
                    is_ctmc=True)
    rng = np.random.default_rng(0)
    mols = []
    for _ in range(8):
        x, a, c, bonds, _bts = generate_molecule(
            rng, int(rng.integers(6, N_PAD + 1)), 5)
        adj = np.zeros((len(a), len(a)), np.int32)
        adj[bonds[:, 0], bonds[:, 1]] = _bts
        mols.append({"x": x, "a": a, "c": c, "adj": np.maximum(adj, adj.T)})
    sizes = np.array([len(m["a"]) for m in mols] * 4)

    lr_cfg = LRScheduleConfig(base_lr=2e-3)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), lr_cfg, 0.0)
    step = jax.jit(make_train_step(model, tx, lr_cfg, 0.0))

    m0 = _sample_metrics(model, state.params, sizes)
    assert m0["frac_atoms_stable"] < 0.3  # untrained: bonded soup

    first_loss = None
    for i in range(600):
        batch = pad_batch([prepare_molecule(rng, m, dc) for m in mols], N_PAD)
        batch = jax.tree.map(jnp.asarray, batch)
        state, metrics = step(state, batch, jax.random.PRNGKey(i),
                              jnp.asarray(i / 100.0))
        if first_loss is None:
            first_loss = float(metrics["total_train_loss"])
    last_loss = float(metrics["total_train_loss"])
    assert last_loss < 0.75 * first_loss

    m1 = _sample_metrics(model, state.params, sizes)
    # 600 tiny-model steps cannot reach full validity, but chemistry must
    # move decisively toward the data (untrained stability is ~0.0)
    assert m1["frac_atoms_stable"] > m0["frac_atoms_stable"] + 0.4


@pytest.mark.slow
@pytest.mark.parametrize("param", ["endpoint", "vector-field", "dirichlet"])
def test_continuous_parameterizations_learn(param):
    """The FlowMol1 train→sample math (endpoint / vector-field / dirichlet)
    must demonstrably learn, not just run: a tiny model trained a few hundred
    steps must markedly improve sampled chemistry over untrained (VERDICT r1
    item 2; parity: vector_field.py:593-811).

    Calibration (900-step runs of the same setup): endpoint reaches
    atoms_stable ~0.48, vector-field ~0.43, dirichlet ~0.59 from ~0.00."""
    cfg = tiny_config(parameterization=param)
    cfg = cfg.__class__(**{**cfg.__dict__, "prior_config": SIMPLEX_PRIOR,
                           "distort_p": 0.0})
    model = FlowMol(cfg)
    dc = DataConfig(prior_config=SIMPLEX_PRIOR, n_atom_types=cfg.n_atom_types,
                    n_bond_types=cfg.n_bond_types, fake_atom_p=0.0,
                    is_ctmc=False)
    rng = np.random.default_rng(0)
    mols = []
    for _ in range(8):
        x, a, c, bonds, _bts = generate_molecule(
            rng, int(rng.integers(6, N_PAD + 1)), 5)
        adj = np.zeros((len(a), len(a)), np.int32)
        adj[bonds[:, 0], bonds[:, 1]] = _bts
        mols.append({"x": x, "a": a, "c": c, "adj": np.maximum(adj, adj.T)})
    sizes = np.array([len(m["a"]) for m in mols] * 4)

    lr_cfg = LRScheduleConfig(base_lr=2e-3)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), lr_cfg, 0.0)
    step = jax.jit(make_train_step(model, tx, lr_cfg, 0.0))

    m0 = _sample_metrics(model, state.params, sizes)
    assert m0["frac_atoms_stable"] < 0.25  # untrained: bonded soup

    first_loss = None
    for i in range(500):
        batch = pad_batch([prepare_molecule(rng, m, dc) for m in mols], N_PAD)
        batch = jax.tree.map(jnp.asarray, batch)
        state, metrics = step(state, batch, jax.random.PRNGKey(i),
                              jnp.asarray(i / 100.0))
        if first_loss is None:
            first_loss = float(metrics["total_train_loss"])
    last_loss = float(metrics["total_train_loss"])
    assert last_loss < 0.8 * first_loss

    m1 = _sample_metrics(model, state.params, sizes)
    assert m1["frac_atoms_stable"] > m0["frac_atoms_stable"] + 0.25


def _tpu_present() -> bool:
    try:
        import jax
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


@pytest.mark.slow
@pytest.mark.skipif(
    not (os.environ.get("FLOWMOL_MEDIUM_ANCHOR") or _tpu_present()),
    reason="medium-scale anchor: ~10 min; runs automatically in the heavy "
           "tier when a TPU is present, or set FLOWMOL_MEDIUM_ANCHOR=1")
def test_endpoint_medium_scale_quality_anchor(tmp_path):
    """Medium-scale quality anchor (VERDICT r2 item 3): the toy anchors
    above verify "learns a little", which the round-2 vector-field run
    passed while shipping 0.00 validity.  This anchor trains the REAL
    128-scalar endpoint recipe (configs/bake_ep_gauss_cos.yml: gaussian
    categorical priors, cosine schedules) for 3k steps through the actual
    train.py/test.py CLIs and requires the quality trajectory of a healthy
    recipe, so a silent quality ceiling fails a test instead of shipping.

    Calibration (r3 bake run, 100-step 48-mol in-loop evals):
    frac_connected 0.38@2.7k -> 0.56@3.5k steps; frac_atoms_stable
    0.66@2.7k -> 0.72@3.5k.  The round-2 uniform-simplex recipe sat at
    ~0.15 connected after 75k steps.  Thresholds sit well under the
    healthy curve and far above the broken one."""
    import json
    import subprocess
    if not os.path.isdir("data/synthetic_qm9_5k"):
        subprocess.run(["python", "tools/make_synthetic_data.py", "--out",
                        "data/synthetic_qm9_5k", "--n", "5000"], check=True)
    import yaml
    cfg = yaml.safe_load(open("configs/bake_ep_gauss_cos.yml"))
    cfg["training"]["output_dir"] = str(tmp_path) + "/"
    cfg_file = tmp_path / "anchor_med.yml"
    cfg_file.write_text(yaml.safe_dump(cfg, sort_keys=False))
    subprocess.run(
        ["python", "-u", "train.py", "--config", str(cfg_file),
         "--run_name", "anchor_med", "--max_steps", "3000"],
        check=True, timeout=3600)
    run_dir = sorted(tmp_path.glob("anchor_med_*"))[-1]
    mfile = tmp_path / "metrics.json"
    subprocess.run(
        ["python", "-u", "test.py", "--model_dir", str(run_dir),
         "--n_mols", "48", "--n_timesteps", "100", "--metrics",
         "--metrics_file", str(mfile)],
        check=True, timeout=1800)
    m = json.loads(mfile.read_text())
    assert m["frac_connected"] >= 0.30, m
    assert m["frac_atoms_stable"] >= 0.55, m
