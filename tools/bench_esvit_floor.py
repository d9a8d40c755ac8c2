"""EsViT window-attention floor: what is the true device cost of the
[196, hd=32] dot chains, per stage, kernel vs XLA vs pure dots?

Round-3 left EsViT at 34% of its computed tile bound, but the bound's
"small-window dot rate" was calibrated from a pre-GELU-policy trace that
NesT later proved ~2x overpriced (PERF.md). This probe measures, for each
EsViT Swin-T stage geometry at batch 128, scan-amortized in one dispatch:

  * pallas   — the shipped packed-qkv two-phase kernel (_call_win)
  * xla      — batched-einsum attention from the same packed qkv
               (bf16 dots, f32 softmax; what XLA lowers without a kernel)
  * dots     — the two batched matmuls alone (scale, no softmax/max):
               the irreducible MXU time for this geometry

If `xla` or `dots` beats `pallas` at a stage, the kernel schedule has
headroom there; if `pallas` ~= `dots` + softmax time, 18.26 ms is the
floor and the bound table gets re-derived from THESE numbers.

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_esvit_floor.py
axon rules (PERF.md): one TPU process, scan-amortized timing, one fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
ITERS = 30

# EsViT Swin-T at 224px (models/swin.py: depths 2/2/6/2, heads 3/6/12/24,
# dims 96*2^i, window 14, stage reso 56/28/14/7 → stage 3 window 7):
# (stage, windows_per_img, N, heads, C, blocks_in_stage)
STAGES = [
    (0, 16, 196, 3, 96, 2),
    (1, 4, 196, 6, 192, 2),
    (2, 1, 196, 12, 384, 6),
    (3, 1, 49, 24, 768, 2),
]


def _time_scan(fn, xs):
    """Two-length slope protocol (canonical shared copy: tools/slope.py): time a scan over n and over 3n iterations
    (same staged buffers cycled — data still varies per iteration, no
    hoisting) and return (t_3n - t_n) / 2n. The per-DISPATCH costs (the
    axon ~24-45 ms turnaround + fetch) appear in both runs identically and
    cancel; the first probe version divided them into as few as 8
    iterations, inflating stage-0 numbers ~2x vs the in-model trace."""
    import jax
    import jax.numpy as jnp

    n = xs.shape[0]

    @jax.jit
    def run(xs):
        def body(_, x):
            return None, jnp.sum(fn(x).astype(jnp.float32))
        return jax.lax.scan(body, None, xs)[1]

    xs3 = jnp.concatenate([xs, xs, xs], axis=0)
    np.asarray(run(xs))   # compile+warm length n
    np.asarray(run(xs3))  # compile+warm length 3n
    best1 = best3 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(xs))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run(xs3))
        best3 = min(best3, time.perf_counter() - t0)
    return (best3 - best1) / (2 * n) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.ops.pallas.window_attention import _call_win

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    dev = accel[0] if accel else jax.devices()[0]
    rng = np.random.default_rng(0)
    rows = []
    total = {"pallas": 0.0, "xla": 0.0, "dots": 0.0}
    for stage, wpi, n, heads, c, blocks in STAGES:
        g = wpi * BATCH  # windows per block invocation
        hd = c // heads
        # distinct per-iteration qkv tensors (hoisting defeat); cap the
        # staged bytes at ~1.2 GB bf16 (the slope protocol stages 4x this:
        # xs + the concatenated 3x run) — stage 0 is 231 MB/copy
        per_copy = g * n * 3 * c * 2
        iters = max(5, min(ITERS, int(1.2e9 // per_copy)))
        host = rng.standard_normal((iters, g, n, 3 * c)).astype(np.float16)
        qkv = jax.device_put(host, dev)
        qkv = jax.jit(lambda x: x.astype(jnp.bfloat16))(qkv)
        bias = jax.device_put(
            rng.standard_normal((heads, n, n)).astype(np.float32), dev
        )

        def pallas_fn(x):
            return _call_win(x, bias, None, heads, wpi)

        def _split(x):
            q = x[..., :c].reshape(g, n, heads, hd).transpose(0, 2, 1, 3)
            k = x[..., c:2 * c].reshape(g, n, heads, hd).transpose(0, 2, 1, 3)
            v = x[..., 2 * c:].reshape(g, n, heads, hd).transpose(0, 2, 1, 3)
            return q, k, v

        def xla_fn(x):
            q, k, v = _split(x)
            scores = jnp.einsum(
                "ghnd,ghmd->ghnm", q * (hd ** -0.5), k,
                preferred_element_type=jnp.float32,
            ) + bias[None]
            p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            return jnp.einsum("ghnm,ghmd->ghnd", p, v,
                              preferred_element_type=jnp.float32)

        def dots_fn(x):
            q, k, v = _split(x)
            scores = jnp.einsum("ghnd,ghmd->ghnm", q * (hd ** -0.5), k)
            return jnp.einsum("ghnm,ghmd->ghnd", scores.astype(x.dtype), v,
                              preferred_element_type=jnp.float32)

        row = {"stage": stage, "windows": g, "N": n, "heads": heads,
               "hd": hd, "blocks": blocks}
        for name, fn in (("pallas", pallas_fn), ("xla", xla_fn),
                         ("dots", dots_fn)):
            ms = _time_scan(fn, qkv)
            row[f"{name}_ms_per_block"] = round(ms, 3)
            row[f"{name}_ms_stage"] = round(ms * blocks, 3)
            total[name] += ms * blocks
        flops = 4 * g * heads * n * n * hd * blocks
        row["stage_gflop"] = round(flops / 1e9, 1)
        rows.append(row)
        print(json.dumps(row))
    summary = {
        "batch": BATCH,
        "total_ms": {k: round(v, 2) for k, v in total.items()},
        "note": "per-batch-128 attention-stack device time, all blocks; "
                "compare vs the 18.26 ms pallas share in "
                "tools/trace_esvit_postgelu.txt",
    }
    print(json.dumps(summary))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "esvit_floor.json")
    with open(out, "w") as f:
        json.dump({"rows": rows, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
