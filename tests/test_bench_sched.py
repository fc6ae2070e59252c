"""Unit tests for bench.StageScheduler — the budget gate that decides which
bench stages run. Pure host logic, but a bug here silently forfeits BENCH
keys (the driver's only performance record), so it is pinned by tests.

Importing `bench` is side-effect-free: jax is imported lazily inside the
stage functions, never at module level.
"""

import bench


def test_initial_scale_is_cold_estimate():
    s = bench.StageScheduler()
    assert s.scale() == 1.0
    assert s.affords(100, 100)       # exactly affordable
    assert not s.affords(100, 99.9)  # one tick short


def test_warm_stage_scales_down_later_estimates():
    s = bench.StageScheduler()
    s.record(100, 10)  # ratio 0.1: warm cache, 10x under estimate
    assert s.scale() == 0.1
    # a 200 s cold estimate now only needs 20 s of budget
    assert s.affords(200, 20)
    assert not s.affords(200, 19)


def test_scale_floor_never_extrapolates_past_10x():
    s = bench.StageScheduler()
    s.record(100, 1)  # 100x under estimate
    assert s.scale() == 0.1


def test_blowout_never_scales_up():
    # r4 regression: a 442 s featurizer stage (est 45) on a warm cache must
    # not inflate later estimates and cascade into skipping everything.
    s = bench.StageScheduler()
    s.record(45, 442)
    assert s.scale() == 1.0
    assert s.affords(110, 110)


def test_low_median_of_mixed_ratios():
    # One trough-blown stage among warm ones: the LOW median ignores it.
    s = bench.StageScheduler()
    s.record(45, 442)   # 9.82
    s.record(15, 1.6)   # 0.1067
    assert abs(s.scale() - 1.6 / 15) < 1e-9   # low median of 2 = the smaller
    s.record(200, 62)   # 0.31
    assert abs(s.scale() - 62 / 200) < 1e-9   # median of 3
    s.record(110, 11)   # 0.1
    assert abs(s.scale() - 1.6 / 15) < 1e-9   # low median of 4


def test_error_stages_still_record_time():
    # main() records a ratio even for stages that raise — their wall time
    # was real budget spent; verify the scheduler handles tiny actuals.
    s = bench.StageScheduler()
    s.record(380, 0.01)
    assert s.scale() == 0.1
