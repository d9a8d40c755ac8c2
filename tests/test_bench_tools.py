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


def _load_op_inventory():
    spec = importlib.util.spec_from_file_location(
        "op_inventory", os.path.join(ROOT, "tools", "op_inventory.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_op_inventory_collect_dot_conv_scan():
    """collect() prices a known graph correctly: a [8,196,32]x[32,196]
    batched dot inside a length-3 scan (count multiplies), a dense 1x1 conv
    (GEMM view), and a depthwise conv (classified off-MXU)."""
    import jax
    import jax.numpy as jnp
    from collections import defaultdict

    inv = _load_op_inventory()

    def fn(x, w, img, k1, kdw):
        def body(c, _):
            return c, jnp.einsum("bnd,dm->bnm", x, w)

        _, ys = jax.lax.scan(body, 0.0, None, length=3)
        a = jax.lax.conv_general_dilated(  # dense 1x1: GEMM [B*HW, 8]x[8, 16]
            img, k1, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b = jax.lax.conv_general_dilated(  # depthwise 3x3, groups=8
            img, kdw, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=8,
        )
        return ys, a, b

    x = jnp.zeros((8, 196, 32))
    w = jnp.zeros((32, 196))
    img = jnp.zeros((2, 14, 14, 8))
    k1 = jnp.zeros((1, 1, 8, 16))
    kdw = jnp.zeros((3, 3, 1, 8))
    jx = jax.make_jaxpr(fn)(x, w, img, k1, kdw)
    table, byts = defaultdict(int), defaultdict(int)
    inv.collect(jx.jaxpr, 1, table, byts)

    # the scanned dot: batch 8 (leading dim is NOT a dot batch dim here --
    # einsum bnd,dm contracts d, so m=8*196 rows), counted 3x by the scan
    dots = {k: v for k, v in table.items() if k[0] == "dot"}
    assert sum(dots.values()) == 3
    ((kind, b, m, k, n),) = [k for k in dots]
    assert (b, m, k, n) == (1, 8 * 196, 32, 196)
    # dense conv -> GEMM [2*196, 8] x [8, 16]
    assert table[("conv", 1, 2 * 14 * 14, 8, 16)] == 1
    # depthwise conv -> dwconv class (in_c_per_group == 1), groups=8
    assert table[("dwconv", 8, 2 * 14 * 14, 9, 1)] == 1
    # tile math: ceil(1568/128)=13 x ceil(32/128)=1 x ceil(196/128)=2
    assert inv._tiles(8 * 196, 32, 196) == 13 * 1 * 2
