"""Adaptive pair-capacity policy (train/capacity.py) — pure logic tests."""

from ed3dgs_tpu.train.capacity import CapacityPolicy


def drive(policy, demands, start=1):
    """Feed per-iteration demands; return [(iteration, new_capacity)]."""
    events = []
    for i, d in enumerate(demands, start=start):
        want = policy.observe(i, d)
        if want is not None:
            events.append((i, want))
    return events


def test_grows_immediately_on_overflow():
    p = CapacityPolicy(capacity=1 << 17, window=100)
    p.start(1)
    ev = drive(p, [1000] * 60 + [200_000])
    assert ev and ev[-1][1] >= int(1.3 * 200_000) // (1 << 17) * (1 << 17)
    assert p.capacity == ev[-1][1]


def test_grows_on_approach_before_overflow():
    cap = 1 << 18
    p = CapacityPolicy(capacity=cap, window=100)
    p.start(1)
    # demand at 95% of capacity: grow_at (1.08) * demand > capacity -> grow
    ev = drive(p, [int(0.95 * cap)] * 200)
    assert ev and ev[0][1] > cap


def test_shrinks_only_after_patience():
    p = CapacityPolicy(capacity=1 << 21, window=100, shrink_patience=3)
    p.start(1)
    ev = drive(p, [300_000] * 250)   # ~2 windows: not yet
    assert ev == []
    ev = drive(p, [300_000] * 200, start=251)   # crosses 3rd+ window
    assert ev and ev[0][1] < (1 << 21)
    assert ev[0][1] >= int(1.15 * 300_000)


def test_small_configs_not_forced_up_to_bucket():
    p = CapacityPolicy(capacity=16384, window=100)
    p.start(1)
    ev = drive(p, [5000] * 400)   # bucket minimum (128k) must not force growth
    assert ev == []
    assert p.capacity == 16384


def test_stable_demand_never_rejits():
    p = CapacityPolicy(capacity=1 << 20, window=100)
    p.start(1)
    ev = drive(p, [700_000] * 1000)
    # bucket_for(700k) = ceil(805k / 128k) * 128k = 917504 < 1M - shrink fires
    # after patience; verify it lands on the snug bucket and then stays
    if ev:
        assert all(c >= int(1.15 * 700_000) for _, c in ev)
        assert len(ev) == 1
