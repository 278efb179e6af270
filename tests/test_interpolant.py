"""Golden-value tests for interpolant schedules vs the reference's closed forms
(interpolant_scheduler.py:131-154)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flowmol_tpu.fm.interpolant import InterpolantSchedule


def test_linear_schedule():
    sch = InterpolantSchedule(("linear",) * 4)
    t = jnp.linspace(0, 1, 11)
    a = np.asarray(sch.alpha_t(t))
    np.testing.assert_allclose(a, np.tile(np.linspace(0, 1, 11)[:, None], (1, 4)),
                               atol=1e-6)
    ap = np.asarray(sch.alpha_t_prime(t))
    np.testing.assert_allclose(ap, 1.0, atol=1e-6)


def test_cosine_schedule_golden():
    nus = (1.0, 2.0, 2.0, 1.5)
    sch = InterpolantSchedule(("cosine",) * 4, nus)
    t = np.linspace(0.01, 0.99, 13)
    a = np.asarray(sch.alpha_t(jnp.array(t)))
    for i, nu in enumerate(nus):
        expected = 1 - np.cos(np.pi * 0.5 * t**nu) ** 2
        np.testing.assert_allclose(a[:, i], expected, atol=1e-5, rtol=1e-4)
    ap = np.asarray(sch.alpha_t_prime(jnp.array(t)))
    for i, nu in enumerate(nus):
        expected = np.pi * 0.5 * np.sin(np.pi * t**nu) * nu * t ** (nu - 1)
        np.testing.assert_allclose(ap[:, i], expected, atol=1e-4)


def test_mixed_schedule_from_config():
    cfg = {"schedule_type": {"x": "cosine", "a": "linear", "c": "linear",
                             "e": "linear"},
           "cosine_params": {"x": 2.0}}
    sch = InterpolantSchedule.from_config(cfg)
    t = jnp.array([0.3])
    a = np.asarray(sch.alpha_t(t))[0]
    assert a[0] == pytest.approx(1 - np.cos(np.pi * 0.5 * 0.3**2) ** 2, abs=1e-6)
    assert a[1] == pytest.approx(0.3, abs=1e-6)


def test_loss_weights_clamped():
    sch = InterpolantSchedule(("linear",) * 4)
    w = np.asarray(sch.loss_weights(jnp.array([0.0, 0.5, 1.0])))
    assert (w >= 0.05 - 1e-9).all() and (w <= 1.5 + 1e-9).all()
    assert w[1, 0] == pytest.approx(1.0)


def test_missing_cosine_params_raises():
    with pytest.raises(ValueError):
        InterpolantSchedule.from_config({"schedule_type": "cosine"})
