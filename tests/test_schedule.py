"""LR schedule: cosine (reference CosineAnnealingLR parity) + warmup ramp."""

import numpy as np
import pytest

from picklebot_tpu.train.optim import cosine_annealing_lr
from picklebot_tpu.utils.config import Config


def test_cosine_matches_torch_formula():
    """torch CosineAnnealingLR closed form (reference train.py:214-215:
    eta_min = lr/10, T_max = max_iters)."""
    base, t_max = 3e-4, 30
    eta = base / 10
    sched = cosine_annealing_lr(base, t_max)
    for e in range(t_max + 1):
        want = eta + (base - eta) * (1 + np.cos(np.pi * e / t_max)) / 2
        np.testing.assert_allclose(float(sched(e)), want, rtol=1e-6)


def test_warmup_ramp_then_cosine():
    base, t_max, w = 1e-3, 20, 5
    sched = cosine_annealing_lr(base, t_max, warmup=w)
    # linear ramp: (e+1)/w of base during warmup
    for e in range(w):
        np.testing.assert_allclose(float(sched(e)), base * (e + 1) / w,
                                   rtol=1e-6)
    # continuous at the boundary: cosine phase starts at base_lr
    np.testing.assert_allclose(float(sched(w)), base, rtol=1e-6)
    # anneals toward eta_min over the remaining span
    eta = base / 10
    np.testing.assert_allclose(float(sched(t_max)), eta, rtol=1e-5)
    # monotone decreasing after warmup
    vals = [float(sched(e)) for e in range(w, t_max + 1)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_warmup_zero_is_plain_cosine():
    a = cosine_annealing_lr(1e-3, 10)
    b = cosine_annealing_lr(1e-3, 10, warmup=0)
    for e in range(11):
        np.testing.assert_allclose(float(a(e)), float(b(e)), rtol=0)


def test_config_warmup_bounds():
    Config(warmup_epochs=0, max_iters=1).validate()
    Config(warmup_epochs=2, max_iters=10).validate()
    with pytest.raises(ValueError):
        Config(warmup_epochs=-1, max_iters=10).validate()
    with pytest.raises(ValueError):
        Config(warmup_epochs=10, max_iters=10).validate()
