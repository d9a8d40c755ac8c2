"""Regression tests for the benchmark tooling's resume behavior.

The fork-per-model sweep (`tools/bench_backbones.py measure(fork=True)`) is
the only protocol that survives a long hardware session (a single axon
client degrades after many graph builds — PERF.md), so its resume semantics
must hold: cached success rows are skipped, cached ERROR rows are retried
(the child overwrites its row), and a sweep where no child ever wrote a row
must not crash on the missing cache file.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "bench_backbones", os.path.join(ROOT, "tools", "bench_backbones.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fork_skips_success_retries_error_rows(tmp_path, monkeypatch):
    mod = _load_module()
    bench_path = tmp_path / "bench.json"
    bench_path.write_text(json.dumps({
        "enc_a": {"value": 123.0, "batch": 128},
        "enc_b": {"error": "RuntimeError: boom"},
    }))
    monkeypatch.setattr(mod, "BENCH_PATH", str(bench_path))

    launched = []

    def fake_run(cmd, cwd=None):
        # the child re-invokes the script with --models <name>; emulate it
        # writing a fresh success row for that model
        name = cmd[cmd.index("--models") + 1]
        launched.append(name)
        rows = json.loads(bench_path.read_text())
        rows[name] = {"value": 999.0, "batch": 128}
        bench_path.write_text(json.dumps(rows))

        class R:
            returncode = 0

        return R()

    # measure() does a function-local `import subprocess`, so patch the real
    # module attribute (monkeypatch restores it afterwards)
    monkeypatch.setattr("subprocess.run", fake_run)
    rows = mod.measure(["enc_a", "enc_b", "enc_c"], fork=True)
    # success row cached, error row retried, new row measured
    assert launched == ["enc_b", "enc_c"]
    assert rows["enc_a"]["value"] == 123.0
    assert rows["enc_b"]["value"] == 999.0
    assert rows["enc_c"]["value"] == 999.0


def test_fork_no_rows_written_returns_empty(tmp_path, monkeypatch):
    mod = _load_module()
    bench_path = tmp_path / "bench.json"  # never created
    monkeypatch.setattr(mod, "BENCH_PATH", str(bench_path))

    def fake_run(cmd, cwd=None):
        class R:
            returncode = 1  # child died before writing anything

        return R()

    # measure() does a function-local `import subprocess`, so patch the real
    # module attribute (monkeypatch restores it afterwards)
    monkeypatch.setattr("subprocess.run", fake_run)
    rows = mod.measure(["enc_a"], fork=True)
    assert rows == {}
    assert not bench_path.exists()
