"""MXU dot/conv shape inventory for a registry key — the analytical half of
a backbone bound analysis (the measured half is tools/profile_trace.py).

Walks the forward jaxpr (recursing into scan bodies x trip count, like
tools/bench_backbones.jaxpr_flops) and records every dot_general /
conv_general_dilated with its GEMM geometry. For each shape it computes:

  * exact FLOPs (2*MACs),
  * MXU 128^3 tile-ops after padding every GEMM dim up to the tile
    (ceil(M/128)*ceil(N/128)*ceil(K/128) per batched dot / conv group),
  * the padded-FLOP inflation factor = how much of the systolic array the
    shape structurally wastes.

The summary turns total padded tiles into a tile-granularity throughput
ceiling at bf16 peak and joins measured img/s from tools/backbone_bench.json
— so "X% MFU" can be split into "the dot shapes only admit Y%" (structural)
vs "the rest is copies/VPU/schedule" (attackable, needs a trace).

Depthwise convolutions (in_channels_per_group == 1) are inventoried
separately: XLA does not lower them onto the MXU at all, so their FLOPs are
excluded from the tile model and reported as VPU/HBM work.

Run on CPU (the jaxpr is backend-independent):
    VITAD_PLATFORM=cpu python tools/op_inventory.py --models enc_eff_former,enc_nest
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BENCH_PATH = os.path.join(ROOT, "tools", "backbone_bench.json")
FLOPS_PATH = os.path.join(ROOT, "tools", "backbone_flops.json")

TILE = 128
PEAK_TFLOPS = 197.0  # v5e bf16
HBM_GBPS = 819.0  # v5e HBM bandwidth

# Non-GEMM primitive buckets for the unfused-traffic estimate. reshape is
# excluded (bitcast under matching layouts); convert/copy and transpose are
# real movement; reduce_window is the pool mixer.
_MOVE = {"transpose", "rev", "gather", "dynamic_slice", "dynamic_update_slice",
         "concatenate", "pad", "copy", "convert_element_type"}
_POOL = {"reduce_window_sum", "reduce_window_max", "reduce_window"}
_REDUCE = {"reduce_sum", "reduce_max", "reduce_min", "argmax", "argmin"}


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _tiles(m, k, n):
    return (
        math.ceil(m / TILE) * math.ceil(k / TILE) * math.ceil(n / TILE)
    )


def _eqn_bytes(eqn):
    """Operand+result bytes at each aval's ACTUAL dtype (the trace runs the
    production bf16 policy). An UNFUSED upper bound — XLA fuses elementwise
    chains so true HBM traffic is lower, but pools/transposes/norm
    reductions over stage maps are genuine traffic."""
    import numpy as np

    n = 0
    for v in list(eqn.invars) + list(eqn.outvars):
        aval = getattr(v, "aval", None)
        if aval is not None and getattr(aval, "shape", None) is not None:
            elems = _prod(aval.shape) if aval.shape else 1
            try:
                n += elems * np.dtype(aval.dtype).itemsize
            except TypeError:
                n += elems * 2
    return n


def collect(jaxpr, mult, table, byts):
    """table[(kind, b, m, k, n)] += mult ; kinds: dot, conv, dwconv.
    byts[bucket] += unfused bytes for non-GEMM primitives."""
    for eqn in jaxpr.eqns:
        p = eqn.primitive.name
        if p == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            a = eqn.invars[0].aval
            bv = eqn.invars[1].aval
            batch = _prod(a.shape[i] for i in lb)
            k = _prod(a.shape[i] for i in lc)
            m = _prod(
                a.shape[i]
                for i in range(len(a.shape))
                if i not in set(lb) | set(lc)
            )
            n = _prod(
                bv.shape[i]
                for i in range(len(bv.shape))
                if i not in set(rb) | set(rc)
            )
            table[("dot", batch, m, k, n)] += mult
        elif p == "conv_general_dilated":
            dn = eqn.params["dimension_numbers"]
            rhs = eqn.invars[1].aval.shape
            out = eqn.outvars[0].aval.shape
            groups = int(eqn.params.get("feature_group_count", 1))
            in_c_per_group = rhs[dn.rhs_spec[1]]
            k_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
            out_c = out[dn.out_spec[1]]
            out_spatial = _prod(
                out[i]
                for i in range(len(out))
                if i not in (dn.out_spec[0], dn.out_spec[1])
            )
            out_batch = out[dn.out_spec[0]]
            # implicit GEMM per group: [B*spatial, K] x [K, out_c/groups]
            m = out_batch * out_spatial
            k = in_c_per_group * k_spatial
            n = out_c // groups
            kind = "dwconv" if in_c_per_group == 1 else "conv"
            table[(kind, groups, m, k, n)] += mult
        elif p == "scan":
            collect(
                eqn.params["jaxpr"].jaxpr, mult * eqn.params["length"],
                table, byts,
            )
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(key)
                if inner is not None:
                    collect(getattr(inner, "jaxpr", inner), mult, table, byts)
                    break
            else:
                if p in _POOL:
                    byts["pool"] += mult * _eqn_bytes(eqn)
                elif p in _MOVE:
                    byts["move"] += mult * _eqn_bytes(eqn)
                elif p in _REDUCE:
                    byts["reduce"] += mult * _eqn_bytes(eqn)
                elif p != "reshape":
                    byts["elemwise"] += mult * _eqn_bytes(eqn)


def inventory(name: str, batch: int, img: int):
    import jax
    import numpy as np

    import bench
    from vit_ad_tpu.config import DtypePolicy

    cpu = jax.devices("cpu")[0]
    # trace the PRODUCTION dtype policy (bf16 compute): GEMM counts are
    # dtype-independent, but the non-GEMM byte buckets must describe the
    # graph that is actually measured (tanh-GELU chain, bf16<->f32 casts
    # around norms) — an f32 trace has a different elementwise mix.
    _, fwd_j = bench.build_model_score(name, cpu, DtypePolicy(), batch, img)
    ims = np.zeros((batch, img, img, 3), np.uint8)
    jx = jax.make_jaxpr(lambda im: fwd_j(im))(ims)
    table = defaultdict(int)
    byts = defaultdict(int)
    collect(jx.jaxpr, 1, table, byts)
    return table, byts


def report(name: str, table, byts, batch: int):
    rows = []
    mxu_flops = mxu_padded = dw_flops = 0.0
    for (kind, b, m, k, n), count in table.items():
        flops = 2.0 * b * m * k * n * count
        if kind == "dwconv":
            dw_flops += flops
            rows.append((kind, b, m, k, n, count, flops, 0, 0.0))
            continue
        tiles = b * _tiles(m, k, n) * count
        padded = tiles * 2.0 * TILE**3
        mxu_flops += flops
        mxu_padded += padded
        rows.append((kind, b, m, k, n, count, flops, tiles, padded))
    rows.sort(key=lambda r: -(r[8] or r[6]))

    print(f"\n## {name} (batch {batch})\n")
    print("| kind | grp/b | M | K | N | count | GFLOPs | Mtiles | padded GF | waste |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for kind, b, m, k, n, count, flops, tiles, padded in rows[:14]:
        waste = f"{padded/flops:.1f}x" if padded else "VPU"
        print(
            f"| {kind} | {b} | {m} | {k} | {n} | {count} "
            f"| {flops/1e9:.1f} | {tiles/1e6:.3f} | {padded/1e9:.1f} | {waste} |"
        )
    if len(rows) > 14:
        rest_f = sum(r[6] for r in rows[14:])
        rest_p = sum(r[8] for r in rows[14:])
        print(f"| (other {len(rows)-14} shapes) | | | | | | {rest_f/1e9:.1f} | | {rest_p/1e9:.1f} | |")

    inflation = mxu_padded / mxu_flops if mxu_flops else 0.0
    ceil_ms = mxu_padded / (PEAK_TFLOPS * 1e9)  # ms per batch at peak tiles
    ideal_ms = mxu_flops / (PEAK_TFLOPS * 1e9)
    ceil_img_s = batch / ceil_ms * 1000.0
    print(
        f"\nMXU FLOPs {mxu_flops/1e9:.1f} GF/batch, tile-padded "
        f"{mxu_padded/1e9:.1f} GF ({inflation:.2f}x inflation); depthwise "
        f"(non-MXU) {dw_flops/1e9:.1f} GF."
    )
    print(
        f"Tile-granularity MXU bound: {ceil_ms:.2f} ms/batch = "
        f"{ceil_img_s:,.0f} img/s ceiling (ideal-shape bound "
        f"{ideal_ms:.2f} ms). Structural MFU ceiling = "
        f"{100.0/inflation:.0f}% of peak."
    )

    total_gb = sum(byts.values()) / 1e9
    hbm_ms = total_gb / HBM_GBPS * 1000.0
    buckets = ", ".join(
        f"{k} {v/1e9:.2f}" for k, v in sorted(byts.items(), key=lambda kv: -kv[1])
    )
    print(
        f"Unfused non-GEMM traffic (actual dtypes): {total_gb:.2f} GB/batch "
        f"({buckets}) = {hbm_ms:.1f} ms at {HBM_GBPS:.0f} GB/s if none of "
        f"it fused — an upper bound; pools/transposes/norm passes over "
        f"stage maps are the irreducible part."
    )

    meas = None
    if os.path.exists(BENCH_PATH):
        with open(BENCH_PATH) as f:
            bench_rows = json.load(f)
        row = bench_rows.get(name, {}) if isinstance(bench_rows, dict) else {}
        meas = row.get("value")
    if meas:
        dev_ms = batch / meas * 1000.0
        print(
            f"Measured {meas:,.0f} img/s = {dev_ms:.2f} ms/batch -> "
            f"{100*ceil_ms/dev_ms:.0f}% of the tile-granularity ceiling; "
            f"the remaining {dev_ms-ceil_ms:.1f} ms/batch is data movement"
            f"/VPU/schedule (trace decomposition pending)."
        )
    return {
        "model": name,
        "batch": batch,
        "mxu_gflops": mxu_flops / 1e9,
        "padded_gflops": mxu_padded / 1e9,
        "inflation": inflation,
        "dw_gflops": dw_flops / 1e9,
        "tile_bound_ms": ceil_ms,
        "tile_bound_img_s": ceil_img_s,
        "unfused_traffic_gb": total_gb,
        "measured_img_s": meas,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="enc_eff_former,enc_nest")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--json", default=None, help="append summaries here")
    args = ap.parse_args()

    out = []
    for name in args.models.split(","):
        table, byts = inventory(name.strip(), args.batch, args.img)
        out.append(report(name.strip(), table, byts, args.batch))
    if args.json:
        existing = []
        if os.path.exists(args.json):
            with open(args.json) as f:
                existing = json.load(f)
        with open(args.json, "w") as f:
            json.dump(existing + out, f, indent=1)


if __name__ == "__main__":
    main()
