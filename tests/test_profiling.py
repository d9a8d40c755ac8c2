"""utils/profiling.py + the run_epochs timing seam: StepTimer accounting,
the compile-epoch exclusion from the steady-state img/s metric, the
single-epoch fallback (round-2 ADVICE item: an early stop after epoch 0
must not report 0.0 img/s), and the VITAD_TRACE device-trace capture
(SURVEY §5: the reference has no tracing at all — this is rebuild-only
surface, so it gets its own tests)."""

import os
import time
from types import SimpleNamespace

import jax

jax.config.update("jax_platforms", "cpu")

from vit_ad_tpu.pipeline.early_stopping import run_epochs
from vit_ad_tpu.utils.profiling import StepTimer, trace


def test_step_timer_accounting():
    t = StepTimer()
    assert t.images_per_sec == 0.0  # no ticks → defined zero, not a crash
    t.start()
    time.sleep(0.01)
    t.tick(100)
    time.sleep(0.01)
    t.tick(50)
    assert t.steps == 2
    assert t.items == 150
    assert t.elapsed > 0.015
    assert t.images_per_sec == t.items / t.elapsed
    t.reset()
    assert (t.steps, t.items, t.elapsed) == (0, 0, 0.0)


def _drive(epochs, patience, n_items=10):
    hp = SimpleNamespace(epochs=epochs, patience=patience)
    calls = []

    def train_epoch(epoch):
        calls.append(epoch)
        time.sleep(0.002)
        return 1.0 / (epoch + 1), n_items

    return run_epochs(hp, train_epoch, lambda: 0.5, lambda: {"w": 1}), calls


def test_run_epochs_excludes_compile_epoch_from_throughput():
    (history, epochs_ran, stopper), calls = _drive(epochs=3, patience=3)
    assert epochs_ran == 3 and calls == [0, 1, 2]
    assert len(history["train_loss"]) == 3
    # steady-state img/s averages epochs 1..2 only (epoch 0 is
    # compile-dominated); 2 ticks × 10 items over > 4 ms of measured time
    assert history["train_images_per_sec"] > 0
    assert "_epoch0_items" not in history


def test_run_epochs_single_epoch_still_reports_throughput():
    (history, epochs_ran, _), _ = _drive(epochs=1, patience=5)
    assert epochs_ran == 1
    assert history["train_images_per_sec"] > 0


def test_run_epochs_patience_zero_falls_back_to_epoch0():
    # patience=0 stops right after the first (improving) epoch — the
    # steady-state tick never fires, so the metric falls back to the only
    # measured epoch instead of 0.0 (round-2 ADVICE item 4)
    (history, epochs_ran, _), _ = _drive(epochs=5, patience=0)
    assert epochs_ran == 1
    assert history["train_images_per_sec"] > 0


def test_vitad_trace_captures_second_epoch(tmp_path, monkeypatch):
    import jax.numpy as jnp

    trace_dir = tmp_path / "trace"
    monkeypatch.setenv("VITAD_TRACE", str(trace_dir))
    hp = SimpleNamespace(epochs=2, patience=5)

    @jax.jit
    def step(x):
        return (x * 2.0).sum()

    def train_epoch(epoch):
        return float(step(jnp.ones(8))), 8

    history, epochs_ran, _ = run_epochs(hp, train_epoch, lambda: 0.5,
                                        lambda: {"w": 1})
    assert epochs_ran == 2
    captured = [
        os.path.join(r, f) for r, _, fs in os.walk(trace_dir) for f in fs
    ]
    assert captured, "VITAD_TRACE produced no trace artifacts"


def test_trace_context_roundtrip(tmp_path):
    with trace(str(tmp_path / "t")):
        pass  # start/stop must nest cleanly even with no device work
    assert (tmp_path / "t").exists()
