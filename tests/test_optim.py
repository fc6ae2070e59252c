"""Optimizer schedules vs the reference formulas (src/optim.py) and the
grad-clip / NaN-skip chain (src/solver.py:138-151)."""

import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.train.optim import (
    GRAD_CLIP,
    Optimizer,
    make_lr_schedule,
    make_optimizer,
    tf_rate_schedule,
)


def _noam_ref(init_lr, warmup, step):
    return init_lr * warmup**0.5 * min((step + 1) * warmup**-1.5, (step + 1) ** -0.5)


def test_lr_schedules_match_reference_formula():
    for name, warmup in [("warmup", 4000.0), ("decay", 1000.0)]:
        sched = make_lr_schedule(0.001, name)
        for step in [0, 10, 999, 1000, 4000, 100000]:
            want = _noam_ref(0.001, warmup, step)
            assert abs(float(sched(step)) - want) < 1e-9, (name, step)
    fx = make_lr_schedule(0.01, "fixed")
    assert fx(0) == fx(12345) == 0.01


def test_tf_rate_schedule():
    tf = tf_rate_schedule(1.0, 0.3, 100)
    assert tf(0) == 1.0
    assert abs(tf(50) - 0.65) < 1e-9
    assert tf(1000) == 0.3
    const = tf_rate_schedule(1.0, 1.0, 50000)  # the configs' setting
    assert const(0) == const(999999) == 1.0


def test_grad_clip_and_nan_skip():
    tx, _ = make_optimizer("Adam", 0.001, "fixed")
    params = {"w": jnp.ones(4)}
    opt = tx.init(params)

    big = {"w": jnp.full(4, 100.0)}  # norm 200 -> clipped to 5
    upd, opt2 = tx.update(big, opt, params)
    p2 = {"w": params["w"] + upd["w"]}
    assert float(jnp.abs(upd["w"]).max()) <= 0.0011  # adam step bounded by lr

    nan_g = {"w": jnp.array([jnp.nan, 1.0, 1.0, 1.0])}
    upd, opt3 = tx.update(nan_g, opt2, params)
    assert float(jnp.abs(upd["w"]).max()) == 0.0  # step skipped

    # recovery after the bad step
    good = {"w": jnp.ones(4)}
    upd, _ = tx.update(good, opt3, params)
    assert np.isfinite(np.asarray(upd["w"])).all()
    assert float(jnp.abs(upd["w"]).max()) > 0


def test_optimizer_facade():
    opt = Optimizer(optimizer="Adam", lr=1e-3, lr_scheduler="decay",
                    tf_start=1.0, tf_end=0.5, tf_step=10,
                    recon_init_weight=2.0, recon_decay=10.0)
    assert opt.pre_step(0) == 1.0
    assert opt.pre_step(100) == 0.5
    assert opt.recon_rate(0) == 2.0
    assert opt.recon_rate(10**9) == 1.0
    assert "Adam" in opt.create_msg()[0]
