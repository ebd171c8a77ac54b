"""Warmup-poly LR schedule vs the reference lambda
(ref:train_utils/train_and_eval.py:414-438)."""

import numpy as np

from stf_unet_tpu.train.early_stop import EarlyStopping
from stf_unet_tpu.train.schedule import warmup_poly_schedule


def _ref_factor(x, num_step, epochs, warmup=True, warmup_epochs=1,
                warmup_factor=1e-3):
    if warmup and x <= warmup_epochs * num_step:
        alpha = float(x) / (warmup_epochs * num_step)
        return warmup_factor * (1 - alpha) + alpha
    return (1 - (x - warmup_epochs * num_step)
            / ((epochs - warmup_epochs) * num_step)) ** 0.9


def test_schedule_matches_reference():
    num_step, epochs, base = 10, 5, 1e-3
    sched = warmup_poly_schedule(base, num_step, epochs)
    for x in range(0, epochs * num_step):
        got = float(sched(x))
        want = base * _ref_factor(x, num_step, epochs)
        assert abs(got - want) < 1e-6, (x, got, want)


def test_schedule_no_warmup():
    sched = warmup_poly_schedule(1.0, 10, 5, warmup=False)
    for x in range(0, 50):
        want = _ref_factor(x, 10, 5, warmup=False, warmup_epochs=0)
        assert abs(float(sched(x)) - want) < 1e-6


def test_early_stopping_reference_behavior():
    """ref:train_utils/early_stopping.py: stops after `patience` consecutive
    epochs with score <= best."""
    es = EarlyStopping(patience=3)
    assert not es.step(0.5)          # first call sets best
    assert not es.step(0.5)          # equal counts as no improvement (1)
    assert not es.step(0.4)          # (2)
    assert not es.step(0.6)          # improvement resets
    assert not es.step(0.5)
    assert not es.step(0.5)
    assert es.step(0.5)              # third consecutive -> stop
    assert es.early_stop
