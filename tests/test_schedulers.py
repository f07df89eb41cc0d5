"""LR schedules vs the reference formulas (masr/optimizer/scheduler.py)."""
import numpy as np
import pytest

from masr_tpu.optimizer.schedulers import (build_optimizer, cosine_with_warmup,
                                           noam_hold_annealing, warmup_lr)


def test_warmup_lr_shape():
    lr = 1e-3
    sched = warmup_lr(lr, warmup_steps=100, min_lr=1e-5)
    # reference: lr * warmup^0.5 * min(step^-0.5, step*warmup^-1.5), 1-indexed
    for step0 in [0, 49, 99, 999, 99999]:
        step = step0 + 1
        expect = lr * 100 ** 0.5 * min(step ** -0.5, step * 100 ** -1.5)
        if expect < 1e-5 and step > 100:
            expect = 1e-5
        assert abs(float(sched(step0)) - expect) < 1e-9, step0
    # peak at warmup boundary equals configured lr
    assert abs(float(sched(99)) - lr) < 1e-9


def test_warmup_lr_floor():
    sched = warmup_lr(1e-3, warmup_steps=10, min_lr=5e-4)
    assert float(sched(100000)) == pytest.approx(5e-4)


def test_noam_hold_annealing_phases():
    sched = noam_hold_annealing(2e-3, max_steps=1000, warmup_steps=100,
                                hold_steps=200, decay_rate=1.0, min_lr=1e-5)
    # warmup: linear (step+1)/(warmup+1)
    assert float(sched(0)) == pytest.approx(2e-3 * 1 / 101)
    assert float(sched(50)) == pytest.approx(2e-3 * 51 / 101)
    # hold: flat at peak
    assert float(sched(150)) == pytest.approx(2e-3)
    assert float(sched(299)) == pytest.approx(2e-3)
    # decay: lr * warmup^d / (step - hold)^d
    step = 500
    expect = 2e-3 * 100.0 / (step - 200)
    assert float(sched(step)) == pytest.approx(expect, rel=1e-5)
    # past max_steps: min_lr
    assert float(sched(2000)) == pytest.approx(1e-5)


def test_cosine_with_warmup():
    sched = cosine_with_warmup(1e-3, T_max=1000, eta_min=1e-5,
                               warmup_steps=100)
    assert float(sched(0)) == pytest.approx(1e-3 / 101)
    assert float(sched(100)) == pytest.approx(1e-3, rel=1e-2)
    # midpoint of cosine ≈ (peak+min)/2
    mid = float(sched(100 + 450))
    assert abs(mid - (1e-3 + 1e-5) / 2) < 1e-4
    # end: eta_min
    assert float(sched(1100)) == pytest.approx(1e-5, rel=1e-3)


def test_build_optimizer_variants():
    for name in ["Adam", "AdamW", "SGD"]:
        conf = {"optimizer": name, "learning_rate": 1e-3,
                "weight_decay": 1e-6, "momentum": 0.9,
                "scheduler": "WarmupLR",
                "scheduler_conf": {"warmup_steps": 10}}
        tx, sched = build_optimizer(conf, grad_clip=5.0, accum_grad=2)
        assert tx is not None and sched is not None
    with pytest.raises(ValueError):
        build_optimizer({"optimizer": "Adagrad", "learning_rate": 1e-3,
                         "scheduler": "WarmupLR"})
    with pytest.raises(ValueError):
        build_optimizer({"optimizer": "Adam", "learning_rate": 1e-3,
                         "scheduler": "StepLR"})
