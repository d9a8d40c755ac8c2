"""Tests for bench.py's tunnel-stall guard (round-4 VERDICT item 1).

BENCH_r03 recorded 580 img/s for a graph whose device ceiling is 3084:
the driver-contract path timed exactly 2 dispatches with no stall
detection, so one axon-tunnel stall poisoned 100% of the timed work.
These tests lock the defense: a minimum timed-work floor, best-of->=2
runs, in-run stall detection with retry, and an honest stalled flag
when every run looks bad.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bench import _measure_with_stall_guard, _plan_dispatches, _throughput


class FakeRuns:
    def __init__(self, durations):
        self.durations = list(durations)
        self.calls = 0

    def __call__(self):
        self.calls += 1
        return self.durations.pop(0)


def test_plan_floor_is_six_dispatches():
    # round-3 failure mode: iters//chunk == 2 dispatches. Never again.
    assert _plan_dispatches(est_dispatch_s=0.83, iters=40, scan_chunk=20) == 6


def test_plan_grows_to_min_work():
    # fast graphs (small per-dispatch time) get enough dispatches to cover
    # ~4 s of expected device work
    assert _plan_dispatches(est_dispatch_s=0.25, iters=40, scan_chunk=20) == 16


def test_plan_caps_dispatch_count():
    assert _plan_dispatches(est_dispatch_s=1e-3, iters=40, scan_chunk=20) == 64


def test_plan_without_estimate_uses_floor():
    assert _plan_dispatches(est_dispatch_s=0.0, iters=40, scan_chunk=20) == 6


def test_clean_runs_stop_at_min_runs():
    runs = FakeRuns([6.0, 6.1, 6.0, 6.0])
    dt, stalled = _measure_with_stall_guard(runs, n_dispatches=6,
                                            est_dispatch_s=1.0)
    assert dt == 6.0 and not stalled
    assert runs.calls == 2  # best-of-2 minimum, no extra runs when clean


def test_first_run_stalled_is_retried_and_discarded():
    # the exact r3 signature: ~4.4 s/dispatch wall vs 0.83-1.0 s device time
    runs = FakeRuns([26.4, 6.0, 6.0, 6.0])
    dt, stalled = _measure_with_stall_guard(runs, n_dispatches=6,
                                            est_dispatch_s=1.0)
    assert dt == 6.0 and not stalled


def test_stall_on_second_run_keeps_clean_first():
    runs = FakeRuns([6.0, 26.4, 26.4, 26.4])
    dt, stalled = _measure_with_stall_guard(runs, n_dispatches=6,
                                            est_dispatch_s=1.0)
    assert dt == 6.0 and not stalled
    assert runs.calls == 2  # first run already beat the estimate


def test_persistent_stall_is_flagged_not_hidden():
    runs = FakeRuns([26.4, 27.0, 26.8, 26.5])
    dt, stalled = _measure_with_stall_guard(runs, n_dispatches=6,
                                            est_dispatch_s=1.0)
    assert dt == 26.4 and stalled
    assert runs.calls == 4  # exhausted max_runs trying for a clean run


def test_no_probe_estimate_self_seeds():
    # when the warm probe itself stalled (or is absent), the first timed run
    # seeds the estimate and clean pairs pass
    runs = FakeRuns([10.0, 10.2])
    dt, stalled = _measure_with_stall_guard(runs, n_dispatches=6,
                                            est_dispatch_s=0.0)
    assert dt == 10.0 and not stalled


def test_throughput_scan_path_end_to_end():
    # integration: the real _throughput scan branch (growth probe, warm
    # probes, stall guard) on the CPU backend with a trivial graph
    import jax
    import jax.numpy as jnp

    device = jax.devices()[0]

    def scan_score(ims):
        return jax.jit(
            lambda xs: jax.lax.scan(
                lambda _, im: (None, jnp.sum(im, axis=(1, 2, 3))), None, xs
            )[1]
        )(ims)

    ips, info = _throughput(
        lambda im: None, device, batch=2, warmup=1, iters=4,
        scan_score=scan_score, scan_chunk=2, max_chunks=4, return_info=True,
    )
    assert ips > 0 and np.isfinite(ips)
    assert info["n_dispatches"] >= 6
    assert info["scan_chunk"] <= 4
    assert info["stall_suspect"] in (False, True)
