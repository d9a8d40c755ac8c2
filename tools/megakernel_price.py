"""Price the flagship ViT-block megakernel with measured constants
(r4 VERDICT item 6).

PERF.md's last un-measured headroom claim: "attention+MLP single-VMEM-
residency megakernel ≈ ≤10%, significant complexity". This tool replaces
the estimate with data. A megakernel that keeps every intermediate of one
DeiT-base block resident in VMEM still must (a) run the same MXU FLOPs and
(b) stream x in, x out, and the block's weights from HBM. Its speed of
light is therefore

    floor = max(block_flops / measured_gemm_rate,
                mandatory_bytes / measured_stream_bw)

and the megakernel's maximum possible gain is t_block - floor, where
t_block is the REAL composed block (models/vit.py _block_apply, Pallas
attention default) slope-timed on hardware. Also reports the sum of the
standalone parts (each paying its own boundary traffic) — the gap
t_block - sum(parts) is the boundary overhead that actually exists today.

Geometry: DeiT-base at the flagship bench shape (B=128, N=198 tokens incl.
cls+dist, D=768, hidden 3072, bf16 compute / f32 LN).

Run: PYTHONPATH=.:/root/.axon_site python tools/megakernel_price.py
axon rules: one TPU process, slope timing ((t(3n)-t(n))/2n), one fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, D, HID, HEADS = 128, 198, 768, 3072, 12


def _time_scan(fn, xs):
    from tools.slope import time_scan_ms  # shared protocol (tools/slope.py)

    return time_scan_ms(fn, xs)


def main():
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.models import vit as V

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    dev = accel[0] if accel else jax.devices()[0]
    rng = np.random.default_rng(0)

    def stage(shape, iters):
        host = rng.standard_normal((iters,) + shape).astype(np.float16)
        xs = jax.device_put(host, dev)
        return jax.jit(lambda x: x.astype(jnp.bfloat16))(xs)

    # 1) streaming bandwidth: y = x + 1 over 256 MB bf16 (read + write)
    m = 128 * 1024 * 1024  # elements = 256 MB bf16
    xs = stage((m,), 4)
    bw_ms = _time_scan(lambda x: x + 1.0, xs)
    stream_bw = 2 * m * 2 / (bw_ms / 1e3)  # bytes/s

    # 2) GEMM rate at the block's own shapes: [B*N, D] x [D, HID] bf16
    rows = B * N
    w_fc = jax.device_put(
        (rng.standard_normal((D, HID)) * 0.02).astype(np.float16), dev
    )
    w_fc = jax.jit(lambda w: w.astype(jnp.bfloat16))(w_fc)
    xs = stage((rows, D), 8)
    gemm_ms = _time_scan(
        lambda x: jnp.einsum("rd,dh->rh", x, w_fc,
                             preferred_element_type=jnp.float32), xs
    )
    gemm_rate = 2 * rows * D * HID / (gemm_ms / 1e3)  # flop/s

    # 3) the real composed block (Pallas attention on TPU by default)
    p = {}
    for name, shape in (
        ("norm1_scale", (D,)), ("norm1_bias", (D,)),
        ("qkv_kernel", (D, 3 * D)), ("qkv_bias", (3 * D,)),
        ("proj_kernel", (D, D)), ("proj_bias", (D,)),
        ("norm2_scale", (D,)), ("norm2_bias", (D,)),
        ("fc1_kernel", (D, HID)), ("fc1_bias", (HID,)),
        ("fc2_kernel", (HID, D)), ("fc2_bias", (D,)),
    ):
        init = (rng.standard_normal(shape) * 0.02).astype(np.float32)
        if name.endswith("_scale"):
            init = np.ones(shape, np.float32)
        p[name] = jax.device_put(init, dev)
    xs = stage((B, N, D), 6)
    block_ms = _time_scan(
        lambda x: V._block_apply(x, p, HEADS, jnp.bfloat16, jnp.float32,
                                 gelu_approx=True), xs
    )

    # 4) standalone parts (each pays its own in/out HBM traffic)
    from vit_ad_tpu.ops.pallas.window_attention import _call_qkv

    parts = {}
    parts["qkv_gemm"] = _time_scan(
        lambda x: jnp.einsum("bnd,de->bne", x, p["qkv_kernel"].astype(x.dtype)),
        stage((B, N, D), 6),
    )
    parts["attention"] = _time_scan(
        lambda x: _call_qkv(x, HEADS), stage((B, N, 3 * D), 4)
    )
    parts["proj_gemm"] = _time_scan(
        lambda x: jnp.einsum("bnd,de->bne", x, p["proj_kernel"].astype(x.dtype)),
        stage((B, N, D), 6),
    )
    parts["fc1_gemm"] = _time_scan(
        lambda x: jnp.einsum("bnd,de->bne", x, p["fc1_kernel"].astype(x.dtype)),
        stage((B, N, D), 6),
    )
    parts["fc2_gemm"] = _time_scan(
        lambda x: jnp.einsum("bnh,hd->bnd", x, p["fc2_kernel"].astype(x.dtype)),
        stage((B, N, HID), 4),
    )
    parts["layer_norm_x2"] = 2 * _time_scan(
        lambda x: V._layer_norm(x, p["norm1_scale"], p["norm1_bias"]),
        stage((B, N, D), 6),
    )

    # speed-of-light floor for a single-VMEM-residency megakernel
    gemm_flops = 2 * B * N * D * (3 * D + D + HID + HID)
    attn_flops = 4 * B * HEADS * N * N * (D // HEADS)
    flops = gemm_flops + attn_flops
    mandatory_bytes = (2 * B * N * D       # x in + out, bf16
                       + (3 * D * D + D * D + 2 * D * HID)) * 2  # weights bf16
    flops_ms = flops / gemm_rate * 1e3
    traffic_ms = mandatory_bytes / stream_bw * 1e3
    floor_ms = max(flops_ms, traffic_ms)

    out = {
        "geometry": {"B": B, "N": N, "D": D, "hidden": HID, "heads": HEADS},
        "measured": {
            "stream_bw_gbps": round(stream_bw / 1e9, 1),
            "gemm_rate_tflops": round(gemm_rate / 1e12, 1),
            "block_ms": round(block_ms, 3),
            "parts_ms": {k: round(v, 3) for k, v in parts.items()},
            "parts_sum_ms": round(sum(parts.values()), 3),
        },
        "floor": {
            "gemm_flops_gflop": round(flops / 1e9, 2),
            "flops_ms": round(flops_ms, 3),
            "mandatory_traffic_mb": round(mandatory_bytes / 1e6, 1),
            "traffic_ms": round(traffic_ms, 3),
            "floor_ms": round(floor_ms, 3),
        },
        "verdict": {
            "megakernel_max_gain_ms": round(block_ms - floor_ms, 3),
            "megakernel_max_gain_pct": round(
                100 * (block_ms - floor_ms) / block_ms, 1
            ),
            "boundary_overhead_vs_parts_ms": round(
                block_ms - sum(parts.values()), 3
            ),
        },
    }
    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "megakernel_price.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
