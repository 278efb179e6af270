"""Checkpoint save/restore/resume roundtrips (the run-dir contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.train_utils.checkpoint import (CheckpointManager, load_config,
                                                save_config)
from flowmol_tpu.train_utils.optim import LRScheduleConfig, lr_at
from flowmol_tpu.train_utils.step import create_train_state
from tests.helpers import tiny_config

# compile-heavy: excluded from the fast gate (pyproject test tiers)
pytestmark = pytest.mark.heavy



def test_state_roundtrip(tmp_path):
    from flowmol_tpu.model import FlowMol

    cfg = tiny_config()
    model = FlowMol(cfg)
    state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                  LRScheduleConfig(), ema_decay=0.9)
    cm = CheckpointManager(tmp_path, max_to_keep=2)
    cm.save(7, state, extra={"epoch": 3, "global_step": 7})

    tpl, _ = create_train_state(model, jax.random.PRNGKey(1),
                                LRScheduleConfig(), ema_decay=0.9)
    step, restored = cm.restore(template=(tpl, {"epoch": 0, "global_step": 0}))
    assert step == 7
    assert restored["extra"]["epoch"] == 3
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored["state"].params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # ema restored too
    e0 = jax.tree.leaves(state.ema)[0]
    e1 = jax.tree.leaves(restored["state"].ema)[0]
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_config_roundtrip(tmp_path):
    cfg = {"dataset": {"atom_map": ["C", "H"]}, "mol_fm": {"distort_p": 0.2}}
    save_config(tmp_path, cfg)
    assert load_config(tmp_path) == cfg


def test_lr_schedule_values():
    cfg = LRScheduleConfig(base_lr=1e-3, warmup_length=2.0,
                           restart_interval=4.0, restart_type="linear")
    # warmup: linear to base over 2 epochs
    assert float(lr_at(cfg, 1.0)) == pytest.approx(5e-4)
    assert float(lr_at(cfg, 2.0)) == pytest.approx(1e-3)
    # one epoch into the first restart interval: 1 - 1/4 of base
    assert float(lr_at(cfg, 3.0)) == pytest.approx(7.5e-4)
    # start of the second interval: back to base
    assert float(lr_at(cfg, 6.0)) == pytest.approx(1e-3)

    cos = LRScheduleConfig(base_lr=1e-3, warmup_length=0.0,
                           restart_interval=2.0, restart_type="cosine")
    assert float(lr_at(cos, 1.0)) == pytest.approx(5e-4, rel=1e-3)


def test_resume_applies_cli_overrides():
    """Resume must honor sweep flags — in particular --max_epochs, without
    which a finished run resumes as a silent no-op (regression: the resume
    branch skipped merge_config_and_args entirely)."""
    import importlib.util
    import sys
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        "train_cli", Path(__file__).parent.parent / "train.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def parse(argv):
        old = sys.argv
        try:
            sys.argv = ["train.py"] + argv
            return mod.parse_args()
        finally:
            sys.argv = old

    ns = parse(["--resume", "x", "--max_epochs", "1600"])
    out = mod.merge_config_and_args(
        {"training": {"trainer_args": {"max_epochs": 400}}}, ns)
    assert out["training"]["trainer_args"]["max_epochs"] == 1600
    # and with no flags the stored config is untouched
    ns = parse(["--resume", "x"])
    out = mod.merge_config_and_args(
        {"training": {"trainer_args": {"max_epochs": 400}}}, ns)
    assert out["training"]["trainer_args"]["max_epochs"] == 400


def test_fit_noop_when_already_at_max_epochs(capsys):
    """A resumed trainer at epoch >= max_epochs must return (with a message),
    not crash or loop."""
    class T:
        epoch, max_epochs = 400, 400
    from flowmol_tpu.train_utils.loop import Trainer
    Trainer.fit(T())
    assert "nothing to do" in capsys.readouterr().out


def test_prefetch_iterator():
    from flowmol_tpu.data.dataset import prefetch_iterator
    out = list(prefetch_iterator(iter(range(10)), depth=3))
    assert out == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_dispatch_step_retries_transient_errors(monkeypatch):
    """Transient accelerator-service faults (transport drops, UNAVAILABLE)
    must be retried with the same inputs — a failed dispatch never updated
    state — while deterministic errors fail fast."""
    import jax

    from flowmol_tpu.train_utils.loop import Trainer

    class T:
        global_step = 7
        _shard = staticmethod(lambda tb: tb)

    calls = {"n": 0}

    def flaky(state, tb, k, ee):
        calls["n"] += 1
        if calls["n"] < 3:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: read body: response body closed")
        return "state", {"loss": 0.0}

    t = T()
    t.state = "s0"
    t.train_step = flaky
    monkeypatch.setattr("time.sleep", lambda s: None)
    out = Trainer._dispatch_step(t, tb=None, k_step=None, epoch_exact=0.0)
    assert out == ("state", {"loss": 0.0}) and calls["n"] == 3

    def fatal(state, tb, k, ee):
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shape mismatch")

    t.train_step = fatal
    import pytest
    with pytest.raises(jax.errors.JaxRuntimeError):
        Trainer._dispatch_step(t, tb=None, k_step=None, epoch_exact=0.0)


def test_resume_does_not_immediately_rerun_evals():
    """fit() anchors the in-loop eval markers at the resumed epoch, so a
    segmented-supervisor restart does not pay an eval per segment."""
    import inspect

    from flowmol_tpu.train_utils.loop import Trainer
    src = inspect.getsource(Trainer.fit)
    assert "last_sample_marker = float(self.epoch)" in src
