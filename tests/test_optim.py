"""Optimizer schedules vs the reference formulas (src/optim.py) and the
grad-clip / NaN-skip chain (src/solver.py:138-151)."""

import jax
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


def test_masked_if_finite_equals_optax_cond_form():
    """apply_if_finite_masked (selects, fusable) is step-for-step identical
    to optax.apply_if_finite (lax.cond) over a finite/NaN/finite sequence:
    same updates, same inner state, same counters, same state layout."""
    import optax

    from semi_tts_tpu.train.optim import apply_if_finite_masked

    inner = optax.chain(optax.clip_by_global_norm(GRAD_CLIP),
                        optax.scale_by_adam(), optax.scale(-0.001))
    ours = apply_if_finite_masked(inner)
    ref = optax.apply_if_finite(inner, max_consecutive_errors=10**9)
    params = {"w": jnp.ones(4), "b": jnp.zeros(2)}
    s_a, s_b = ours.init(params), ref.init(params)

    seq = [
        {"w": jnp.full(4, 2.0), "b": jnp.ones(2)},
        {"w": jnp.array([jnp.nan, 1.0, 1.0, 1.0]), "b": jnp.ones(2)},
        {"w": jnp.full(4, jnp.inf), "b": jnp.ones(2)},
        {"w": jnp.full(4, -0.5), "b": jnp.ones(2)},
    ]
    import jax

    for g in seq:
        u_a, s_a = ours.update(g, s_a, params)
        u_b, s_b = ref.update(g, s_b, params)
        for la, lb in zip(jax.tree_util.tree_leaves(u_a),
                          jax.tree_util.tree_leaves(u_b)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-7)
        assert int(s_a.notfinite_count) == int(s_b.notfinite_count)
        assert bool(s_a.last_finite) == bool(s_b.last_finite)
        assert int(s_a.total_notfinite) == int(s_b.total_notfinite)
        for la, lb in zip(jax.tree_util.tree_leaves(s_a.inner_state),
                          jax.tree_util.tree_leaves(s_b.inner_state)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-7)
    # identical tree structure => checkpointed opt_states interchange
    assert (jax.tree_util.tree_structure(s_a)
            == jax.tree_util.tree_structure(s_b))


def test_optimizer_facade():
    opt = Optimizer(optimizer="Adam", lr=1e-3, lr_scheduler="decay",
                    tf_start=1.0, tf_end=0.5, tf_step=10,
                    recon_init_weight=2.0, recon_decay=10.0)
    assert opt.pre_step(0) == 1.0
    assert opt.pre_step(100) == 0.5
    assert opt.recon_rate(0) == 2.0
    assert opt.recon_rate(10**9) == 1.0
    assert "Adam" in opt.create_msg()[0]


def test_advance_lr_schedule_resumes_noam_from_step():
    """Imported reference checkpoints restart Adam fresh but must NOT restart
    the Noam warmup: `advance_lr_schedule` fast-forwards the schedule count
    so the first update after import is scaled by schedule(global_step), not
    schedule(0) (`src/optim.py:19-27` recomputes lr from the carried step)."""
    import optax

    from semi_tts_tpu.train.optim import advance_lr_schedule

    tx, sched = make_optimizer("Adam", 1e-3, "decay")
    params = {"w": jnp.ones(4)}
    step = 50_000
    fresh = tx.init(params)
    resumed = advance_lr_schedule(fresh, step)

    # the schedule count leaf carries the step; adam's moments/count stay fresh
    assert int(resumed.inner_state[-1].count) == step
    assert isinstance(resumed.inner_state[-1], optax.ScaleByScheduleState)
    assert int(resumed.inner_state[1].count) == 0
    assert float(jnp.abs(resumed.inner_state[1].mu["w"]).max()) == 0.0
    # everything else (structure) is untouched
    assert jax.tree_util.tree_structure(resumed) == jax.tree_util.tree_structure(fresh)

    # the realized first-update magnitude follows schedule(step): adam
    # normalizes the gradient to ~unit scale, so |update| ~= lr(step)
    g = {"w": jnp.full(4, 0.5)}
    upd_resumed, _ = tx.update(g, resumed, params)
    upd_fresh, _ = tx.update(g, fresh, params)
    ratio = float(jnp.abs(upd_resumed["w"]).max() / jnp.abs(upd_fresh["w"]).max())
    want = float(sched(step) / sched(0))
    assert abs(ratio - want) / want < 1e-4
