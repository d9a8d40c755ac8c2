"""Device-trace decomposition for any registry model's forward.

Runs the model's uint8→scores forward N times under jax.profiler.trace and
aggregates per-op device time from the xplane proto (the same data the
round-2 flagship table in PERF.md came from, now automated). Usage:

    PYTHONPATH=. python tools/profile_trace.py --model enc_esvit --batch 128

Prints total device time per iteration and the top ops by accumulated
duration — the starting point of every perf pass (VERDICT round-2 items
2/4: EsViT and ResNet-50 deserve the flagship's rigor).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def parse_xplane(trace_dir: str, device_hint: str = "TPU"):
    """Aggregate (op name → total EXCLUSIVE duration ps, count) from the
    device plane's serialized 'XLA Ops' lane of the newest xplane.pb under
    trace_dir.

    The 'XLA Ops' lane nests wrapper events (a `%while` event spans every
    op of its body; `jit_*` module events span everything), and the 'Async
    XLA Ops' lane holds DMA copy-start/copy-done pairs whose durations
    include the time they OVERLAP compute — summing raw durations across
    lanes double-counts wildly (a 45 ms step reads as 230+ ms). Exclusive
    time is computed with an interval stack: each event is charged its
    span minus the spans of events nested inside it, so the per-op values
    sum exactly to the wall time of the lane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    agg = collections.defaultdict(lambda: [0.0, 0])  # name -> [ps, count]
    plane_names = []
    for plane in space.planes:
        plane_names.append(plane.name)
        if device_hint.lower() not in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(
                (
                    (ev.offset_ps, ev.duration_ps,
                     meta[ev.metadata_id].name if ev.metadata_id in meta
                     else "?")
                    for ev in line.events
                ),
                key=lambda t: (t[0], -t[1]),
            )
            stack = []  # [start, end, name, child_time]

            def close(upto):
                while stack and stack[-1][1] <= upto:
                    s, e, n, ct = stack.pop()
                    agg[n][0] += (e - s) - ct
                    agg[n][1] += 1
                    if stack:
                        stack[-1][3] += e - s
            for s, d, n in evs:
                close(s)
                stack.append([s, s + d, n, 0.0])
            close(float("inf"))
    return agg, plane_names


def categorize(name: str) -> str:
    """Bucket an XLA op event into the decomposition categories used by the
    PERF.md tables. Values are exclusive times (see parse_xplane), so the
    `%while` bucket is pure loop overhead, not the body.

    Buckets key off the HLO opcode (the token before the first '(' after
    '='), NOT substrings of the whole event name — fusion events carry
    their fused-computation names (often `...calls=%copy_fusion...`) in
    the metadata string, which a substring match miscounts as copies.
    The instruction NAME prefix (e.g. `%copy_fusion.3 = ... fusion(...)`)
    still routes layout-changing fusions to copies, which is what they
    are."""
    import re

    head, _, rest = name.partition(" = ")
    # opcode = lowercase token preceded by a space, directly before its
    # operand paren (layout tilings like T(8,128) are uppercase/comma-bound
    # and never match)
    m = re.search(r"\s([a-z][a-z-]*)\(", rest)
    opcode = m.group(1) if m else ""
    iname = head.lstrip("%")
    if opcode == "while" or iname.startswith("while"):
        return "while-overhead"
    if opcode == "custom-call" or iname.startswith("_call"):
        return "pallas-kernels"
    if opcode in ("copy", "transpose", "bitcast", "copy-start", "copy-done") \
            or iname.startswith(("copy", "transpose", "bitcast")):
        return "copies/transposes"
    if "reduce" in iname or "norm" in iname:
        return "reduce/LN"
    if opcode in ("convolution", "dot") or iname.startswith(
            ("convolution", "dot")):
        return "conv/matmul"
    if opcode == "fusion" or iname.startswith("fusion"):
        return "fusion(matmul/elemwise)"
    return "other"


def print_categories(agg, iters: int) -> None:
    cats = collections.defaultdict(float)
    for name, (ps, _) in agg.items():
        cats[categorize(name)] += ps / 1e9 / iters
    total = sum(cats.values())
    print("category decomposition (exclusive device time, ms/iter):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v:8.2f}  {100*v/total:5.1f}%")
    print(f"  {'TOTAL':28s} {total:8.2f}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="enc_esvit")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="")
    args = ap.parse_args()

    import jax

    import bench

    from vit_ad_tpu.config import DtypePolicy

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    device = accel[0] if accel else jax.devices()[0]
    print(f"device: {device}  model: {args.model}  batch: {args.batch}",
          flush=True)

    _, fwd = bench.build_model_score(
        args.model, device, DtypePolicy(), args.batch
    )
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, size=(args.batch, 224, 224, 3), dtype=np.uint8),
        device,
    )
    for _ in range(args.warmup):
        np.asarray(fwd(images))

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="esvit_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            np.asarray(fwd(images))

    agg, planes = parse_xplane(trace_dir)
    print(f"planes: {planes}", flush=True)
    total_ps = sum(v[0] for v in agg.values())
    print(f"total device op time: {total_ps/1e9/args.iters:.2f} ms/iter "
          f"({args.iters} iters)\n", flush=True)
    print_categories(agg, args.iters)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[: args.top]
    print(f"{'op':60s} {'ms/iter':>9s} {'count':>6s} {'%':>6s}")
    for name, (ps, cnt) in rows:
        print(f"{name[:60]:60s} {ps/1e9/args.iters:9.3f} {cnt:6d} "
              f"{100*ps/total_ps:6.1f}")
    print(f"\ntrace dir: {trace_dir}")


if __name__ == "__main__":
    main()
