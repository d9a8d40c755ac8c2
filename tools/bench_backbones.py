"""Per-backbone measured-performance sweep (round-2 VERDICT items 2/4/5).

Two modes:

  --flops    Compute FLOPs/img for every registry key via XLA's own cost
             analysis on the CPU backend (same HLO math as TPU; dtype does
             not change the count). Writes tools/backbone_flops.json.
             Run with VITAD_PLATFORM=cpu.

  (default)  Measure TPU inference throughput for the given --models (all
             21 registry keys by default) with bench.py's scan-of-batches
             protocol, join with the FLOP table into MFU, and append rows to
             tools/backbone_bench.json + print a markdown table for
             PARITY.md.

axon rules apply (see PERF.md): init on CPU, params as jit args, one fetch
per measurement, generous warmup, ONE process at a time on the chip.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FLOPS_PATH = os.path.join(ROOT, "tools", "backbone_flops.json")
BENCH_PATH = os.path.join(ROOT, "tools", "backbone_bench.json")


def all_model_names():
    from vit_ad_tpu.registry import get_possible_models

    return get_possible_models()


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def jaxpr_flops(jaxpr) -> float:
    """Exact matmul/conv FLOPs (2·MACs) by walking the jaxpr, recursing into
    scan bodies × trip count and call/pjit/remat sub-jaxprs. XLA's own
    cost_analysis is unusable here: it counts lax.scan bodies ONCE (our
    backbones are scan-stacked) and XLA:CPU's oneDNN custom calls report
    zero flops. Elementwise work is excluded — this is the MXU denominator
    MFU wants."""
    total = 0.0
    for eqn in jaxpr.eqns:
        p = eqn.primitive.name
        if p == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            a = eqn.invars[0].aval
            b = eqn.invars[1].aval
            batch = _prod(a.shape[i] for i in lb)
            k = _prod(a.shape[i] for i in lc)
            m = _prod(
                a.shape[i] for i in range(len(a.shape)) if i not in set(lb) | set(lc)
            )
            n = _prod(
                b.shape[i] for i in range(len(b.shape)) if i not in set(rb) | set(rc)
            )
            total += 2.0 * batch * m * n * k
        elif p == "conv_general_dilated":
            dn = eqn.params["dimension_numbers"]
            rhs = eqn.invars[1].aval.shape
            out = eqn.outvars[0].aval.shape
            in_c_per_group = rhs[dn.rhs_spec[1]]
            k_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
            total += 2.0 * _prod(out) * in_c_per_group * k_spatial
        elif p == "scan":
            total += eqn.params["length"] * jaxpr_flops(
                eqn.params["jaxpr"].jaxpr
            )
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(key)
                if inner is not None:
                    inner = getattr(inner, "jaxpr", inner)
                    total += jaxpr_flops(inner)
                    break
            else:
                if p == "custom_vjp_call":
                    fn = eqn.params.get("fun_jaxpr") or eqn.params.get(
                        "call_jaxpr"
                    )
                    if fn is not None:
                        total += jaxpr_flops(getattr(fn, "jaxpr", fn))
    return total


def compute_flops(names, img=224):
    """Matmul/conv FLOPs per image for each key (jaxpr walk on the CPU
    trace — Pallas kernels resolve to their XLA cores there, so everything
    is visible as dot_general/conv primitives)."""
    import jax

    import bench

    from vit_ad_tpu.config import DtypePolicy

    batch = 2
    table = {}
    if os.path.exists(FLOPS_PATH):
        with open(FLOPS_PATH) as f:
            table = json.load(f)
    cpu = jax.devices("cpu")[0]
    for name in names:
        if name in table:
            print(f"{name}: cached {table[name]/1e9:.2f} GFLOPs/img")
            continue
        try:
            import numpy as np

            _, fwd_j = bench.build_model_score(
                name, cpu, DtypePolicy.f32(), batch, img
            )
            ims = np.zeros((batch, img, img, 3), np.uint8)
            jx = jax.make_jaxpr(lambda im: fwd_j(im))(ims)
            fl = jaxpr_flops(jx.jaxpr) / batch
            table[name] = fl
            print(f"{name}: {fl/1e9:.2f} GFLOPs/img")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
        gc.collect()
        with open(FLOPS_PATH, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
    return table


def measure(names, iters=20, fork=False):
    """fork=True runs each model in a fresh subprocess (recommended for >1
    model): a long-lived axon client degrades after many graph builds —
    observed on hardware as whole timed runs pinned ~5x slow (enc_deit read
    782 img/s in a 15-model process vs 4100+ clean) and eventually a full
    stall, and best-of-2 cannot save a run when BOTH repeats sit in the
    degraded state. Each child writes its row into BENCH_PATH itself."""
    if fork:
        import subprocess

        for name in names:
            rows = {}
            if os.path.exists(BENCH_PATH):
                with open(BENCH_PATH) as f:
                    rows = json.load(f)
            if name in rows and "value" in rows[name]:
                print(f"{name}: cached {rows[name]['value']} img/s")
                continue
            # error rows don't block a retry: the child overwrites its row
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--models", name, "--iters", str(iters)],
                cwd=ROOT,
            )
            if r.returncode != 0:
                print(f"{name}: subprocess rc={r.returncode}")
        if os.path.exists(BENCH_PATH):
            with open(BENCH_PATH) as f:
                return json.load(f)
        return {}

    import bench

    rows = {}
    if os.path.exists(BENCH_PATH):
        with open(BENCH_PATH) as f:
            rows = json.load(f)
    for name in names:
        if name in rows and "value" in rows[name]:
            print(f"{name}: cached {rows[name]['value']} img/s")
            continue
        try:
            out = bench.bench_backbone(name, iters=iters)
            rows[name] = out
            print(json.dumps({"model": name, **out}), flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            rows[name] = {"error": f"{type(e).__name__}: {e}"}
        gc.collect()
        with open(BENCH_PATH, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
    return rows


def markdown(rows):
    lines = ["| model | batch | img/s/chip | GFLOPs/img | MFU |",
             "|---|---|---|---|---|"]
    for name in sorted(rows):
        r = rows[name]
        if "error" in r:
            lines.append(f"| {name} | — | error | — | — |")
            continue
        mfu = f"{100*r['mfu']:.1f}%" if "mfu" in r else "—"
        gf = r.get("gflops_per_img", "—")
        lines.append(
            f"| {name} | {r['batch']} | {r['value']} | {gf} | {mfu} |"
        )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flops", action="store_true")
    ap.add_argument("--models", default="",
                    help="comma-separated registry keys (default: all)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fork", action="store_true",
                    help="fresh subprocess per model (see measure docstring)")
    args = ap.parse_args()
    names = (
        [n for n in args.models.split(",") if n]
        if args.models else all_model_names()
    )
    if args.flops:
        compute_flops(names)
        return
    rows = measure(names, iters=args.iters, fork=args.fork or len(names) > 3)
    print()
    print(markdown(rows))


if __name__ == "__main__":
    main()
