"""NesT-tiny per-level floor probe (r4 VERDICT item 5): kernel vs XLA vs
bare dots for every block-attention geometry, plus the ConvPool
aggregations — the same slope-protocol exercise that overturned EsViT's
stale bound in round 4 (tools/bench_esvit_floor.py) and bought +34%.

NesT at 29.2% MFU is the next-worst hierarchical backbone row
(tools/backbone_bench.json). Its blocks are unshifted windows riding the
packed-qkv ViT kernel (models/nest.py NestBlock → _call_qkv, one block per
grid cell), so the open questions are (a) whether the kernel leaves
per-level headroom vs plain XLA or the bare-dot floor, and (b) how much of
the model's time the two ConvPool stages (conv3x3+LN+maxpool — pure XLA)
account for.

Geometry at 224px (models/nest.py nest_tiny: patch 4, dims 96/192/384,
heads 3/6/12, depths 2/2/8, block side 14):

  level 0: 16 blocks/img, N=196, heads 3,  C=96,  depth 2
  level 1:  4 blocks/img, N=196, heads 6,  C=192, depth 2
  level 2:  1 block/img,  N=196, heads 12, C=384, depth 8

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_nest_floor.py
axon rules (PERF.md): one TPU process, scan-amortized slope timing
((t(3n)-t(n))/2n — per-dispatch tunnel costs cancel), one fetch per run.
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

# (level, blocks_per_img, N, heads, C, depth)
LEVELS = [
    (0, 16, 196, 3, 96, 2),
    (1, 4, 196, 6, 192, 2),
    (2, 1, 196, 12, 384, 8),
]

# ConvPool geometries: (level, H, W, C_in, C_out)
POOLS = [
    (0, 56, 56, 96, 192),
    (1, 28, 28, 192, 384),
]


def _time_scan(fn, xs):
    from tools.slope import time_scan_ms  # shared protocol (tools/slope.py)

    return time_scan_ms(fn, xs)


def main():
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.ops.pallas.window_attention import _call_qkv

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    dev = accel[0] if accel else jax.devices()[0]
    rng = np.random.default_rng(0)
    rows = []
    total = {"pallas": 0.0, "xla": 0.0, "dots": 0.0}
    for lvl, bpi, n, heads, c, depth in LEVELS:
        g = bpi * BATCH
        hd = c // heads
        per_copy = g * n * 3 * c * 2
        iters = max(5, min(ITERS, int(1.2e9 // per_copy)))
        host = rng.standard_normal((iters, g, n, 3 * c)).astype(np.float16)
        qkv = jax.device_put(host, dev)
        qkv = jax.jit(lambda x: x.astype(jnp.bfloat16))(qkv)

        def pallas_fn(x):
            return _call_qkv(x, heads)

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
            )
            p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            return jnp.einsum("ghnm,ghmd->ghnd", p, v,
                              preferred_element_type=jnp.float32)

        def dots_fn(x):
            q, k, v = _split(x)
            scores = jnp.einsum("ghnd,ghmd->ghnm", q * (hd ** -0.5), k)
            return jnp.einsum("ghnm,ghmd->ghnd", scores.astype(x.dtype), v,
                              preferred_element_type=jnp.float32)

        row = {"level": lvl, "blocks": g, "N": n, "heads": heads,
               "hd": hd, "depth": depth}
        for name, fn in (("pallas", pallas_fn), ("xla", xla_fn),
                         ("dots", dots_fn)):
            ms = _time_scan(fn, qkv)
            row[f"{name}_ms_per_block"] = round(ms, 3)
            row[f"{name}_ms_level"] = round(ms * depth, 3)
            total[name] += ms * depth
        row["level_gflop"] = round(4 * g * heads * n * n * hd * depth / 1e9, 1)
        rows.append(row)
        print(json.dumps(row))

    # ConvPool floors: full convpool (conv+LN+maxpool, what the model runs)
    # vs the conv alone (its MXU floor)
    pool_rows = []
    for lvl, h, w, cin, cout in POOLS:
        per_copy = BATCH * h * w * cin * 2
        iters = max(5, min(ITERS, int(1.2e9 // per_copy)))
        host = rng.standard_normal((iters, BATCH, h, w, cin)).astype(np.float16)
        xs = jax.device_put(host, dev)
        xs = jax.jit(lambda x: x.astype(jnp.bfloat16))(xs)
        kern = jax.device_put(
            (rng.standard_normal((3, 3, cin, cout)) * 0.02).astype(np.float32),
            dev,
        )
        scale = jax.device_put(np.ones((cout,), np.float32), dev)

        def conv_fn(x):
            return jax.lax.conv_general_dilated(
                x, kern.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def pool_fn(x):
            import flax.linen as fnn

            y = conv_fn(x).astype(jnp.float32)
            mean = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.var(y, axis=-1, keepdims=True)
            y = ((y - mean) * jax.lax.rsqrt(var + 1e-6) * scale).astype(x.dtype)
            return fnn.max_pool(y, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))

        row = {"pool_after_level": lvl, "H": h, "C_in": cin, "C_out": cout}
        row["conv_ms"] = round(_time_scan(conv_fn, xs), 3)
        row["convpool_ms"] = round(_time_scan(pool_fn, xs), 3)
        row["conv_gflop"] = round(
            2 * BATCH * h * w * 9 * cin * cout / 1e9, 1
        )
        pool_rows.append(row)
        print(json.dumps(row))

    summary = {
        "batch": BATCH,
        "attention_total_ms": {k: round(v, 2) for k, v in total.items()},
        "convpool_total_ms": round(sum(r["convpool_ms"] for r in pool_rows), 2),
        "note": "per-batch-128 device time; compare vs the NesT e2e number "
                "in tools/backbone_bench.json (29.2% MFU row)",
    }
    print(json.dumps(summary))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "nest_floor.json")
    with open(out, "w") as f:
        json.dump({"levels": rows, "pools": pool_rows, "summary": summary},
                  f, indent=1)


if __name__ == "__main__":
    main()
