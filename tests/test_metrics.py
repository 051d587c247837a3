"""Metrics layer (SURVEY §5.5): counters/gauges/timers + JSON export."""

import json

from contangle_zkcp_tpu.utils import metrics


def test_counters_gauges_timers():
    reg = metrics.Registry()
    reg.count("a")
    reg.count("a", 2)
    reg.gauge("g", 7)
    reg.observe("t", 0.5)
    reg.observe("t", 1.5)
    snap = reg.snapshot()
    assert snap["counters"]["a"] == 3
    assert snap["gauges"]["g"] == 7
    assert snap["timers"]["t"]["count"] == 2
    assert snap["timers"]["t"]["total_sec"] == 2.0
    assert snap["timers"]["t"]["max_sec"] == 1.5
    assert json.loads(reg.to_json()) == snap
    reg.reset()
    assert reg.snapshot() == {"counters": {}, "gauges": {}, "timers": {}}


def test_timed_decorator_and_module_registry():
    metrics.registry().reset()

    @metrics.timed("unit.phase")
    def work(x):
        return x + 1

    assert work(1) == 2
    assert work(2) == 3
    snap = metrics.registry().snapshot()
    assert snap["timers"]["unit.phase"]["count"] == 2


def test_msm_run_records_metrics():
    import random

    metrics.registry().reset()
    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.msm import MSM

    C = ci.BLS12_381_G1
    dev = SWDevice(fi.bls12_381_fq(), C)
    rng = random.Random(3)
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(8)]
    MSM(dev, scalar_bits=255, c=4).run(pts, [rng.randrange(C.order) for _ in range(8)])
    snap = metrics.registry().snapshot()
    assert snap["counters"]["msm.points"] == 8
    assert "msm.heavy_buckets" in snap["gauges"]
