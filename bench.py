"""Benchmark: flagship inference throughput on the attached TPU chip.

Measures images/sec/chip for DeiT-base + FastFlow-NF(20 steps) anomaly
inference at 224px bf16 — the reference's north-star metric (BASELINE.json:
">=5x CPU-reference inference throughput per v5e chip").

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec on TPU, "unit": "img/s",
   "vs_baseline": tpu / (5 * cpu_reference)}

vs_baseline >= 1.0 means the >=5x-over-CPU target is met. The CPU reference
(same graph on the host CPU, f32) is measured once and cached in
bench_cpu_baseline.json.

axon-runtime notes baked in here:
  * init runs on CPU (initializing on the TPU would remote-compile the init
    graph too)
  * ONE fused jit graph (uint8 -> scores) is the default; BENCH_FUSED=0
    falls back to separately-jitted encoder/flow
  * a device->host fetch costs a ~30 ms tunnel roundtrip, so scores are
    accumulated on device across all timed steps and fetched ONCE (the
    validator's real pattern: metrics consume the whole score vector at
    the end); block_until_ready returns early on axon, so the fetch is
    also the completion barrier.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_cpu_baseline.json")
BATCH = 128
WARMUP = 2
ITERS = 20


def _build(device, dtypes, fused: bool):
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.models.flow import NormalizingFlow, patch_tokens_to_map
    from vit_ad_tpu.models.vit import deit_base_distilled_patch16

    img = 224
    encoder = deit_base_distilled_patch16(img, dtypes)
    flow = NormalizingFlow(
        num_channels=encoder.embed_dim, img_size=img,
        num_patches=encoder.num_patches, hidden_ratio=0.16, flow_steps=20,
        dtypes=dtypes,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        k1, k2 = jax.random.split(jax.random.key(0))
        enc_params = encoder.init(k1, jnp.zeros((1, img, img, 3), jnp.float32))
        side = int(np.sqrt(encoder.num_patches))
        flow_params = flow.init(
            k2, jnp.zeros((1, side, side, encoder.embed_dim), jnp.float32)
        )
        mean, std = default_norm_stats()
        mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)
    enc_params = jax.device_put(enc_params, device)
    flow_params = jax.device_put(flow_params, device)
    mean_j = jax.device_put(mean_j, device)
    std_j = jax.device_put(std_j, device)

    # params are explicit jit ARGUMENTS: closed-over arrays are serialized
    # into the axon remote-compile payload and trip its size limit.
    def encode(ep, images_u8):
        x = preprocess(images_u8, mean_j, std_j)
        return encoder.apply(ep, x).patch_embedding

    def head(fp, feats):
        out = flow.apply(fp, patch_tokens_to_map(feats))
        am = out.anomaly_score_map
        return jnp.max(am.reshape(am.shape[0], -1), axis=1)

    if fused:
        fused_j = jax.jit(lambda ep, fp, im: head(fp, encode(ep, im)))
        score = lambda im: fused_j(enc_params, flow_params, im)

        # scan-of-batches graph: params remain explicit jit args (closure
        # captures would be serialized into the axon compile payload)
        def chunk(ep, fp, ims):
            return jax.lax.scan(
                lambda _, im: (None, head(fp, encode(ep, im))), None, ims
            )[1]

        chunk_j = jax.jit(chunk)
        scan_score = lambda ims: chunk_j(enc_params, flow_params, ims)
    else:
        encode_j = jax.jit(encode)
        head_j = jax.jit(head)
        score = lambda im: head_j(flow_params, encode_j(enc_params, im))
        scan_score = None
    return score, scan_score


def _plan_dispatches(est_dispatch_s: float, iters: int, scan_chunk: int,
                     min_dispatches: int = 6, min_work_s: float = 4.0,
                     max_dispatches: int = 64) -> int:
    """How many scan dispatches the timed run needs.

    round-3 postmortem (VERDICT r3 item 1): the driver-captured flagship
    number collapsed 5x because the timed run was exactly n_chunks=2
    dispatches — a single tunnel stall poisoned 100% of the timed work.
    Floor the timed run at >=6 dispatches AND >=~4 s of expected device
    work so one stalled dispatch is a visible outlier, not the whole
    measurement."""
    n = max(min_dispatches, iters // max(1, scan_chunk))
    if est_dispatch_s > 0:
        n = max(n, int(np.ceil(min_work_s / est_dispatch_s)))
    return min(n, max_dispatches)


def _measure_with_stall_guard(run_once, n_dispatches: int,
                              est_dispatch_s: float = 0.0,
                              min_runs: int = 2, max_runs: int = 4,
                              stall_factor: float = 1.8):
    """Repeat a timed run until one looks stall-free; return (best_dt, stalled).

    `run_once()` -> wall seconds for `n_dispatches` dispatches + one fetch.
    The axon tunnel occasionally stalls a whole run (observed round 3:
    ~4.4 s/dispatch vs the 0.83 s device time — BENCH_r03 recorded 580 img/s
    for a 3084 img/s graph). Stalls only ever make a run SLOWER, so:

      * always take the best of >= `min_runs` runs (best-of-2 minimum);
      * a run whose per-dispatch wall clock exceeds `stall_factor` x the
        best per-dispatch estimate seen so far (seeded from the warm probe,
        refined by every run) is treated as stalled and retried, up to
        `max_runs` total runs;
      * if every run looks stalled, return the best anyway with
        stalled=True so callers can flag the number instead of hiding it.
    """
    best_dt = None
    est = est_dispatch_s if est_dispatch_s > 0 else None
    runs = 0
    while runs < max_runs:
        dt = run_once()
        runs += 1
        best_dt = dt if best_dt is None else min(best_dt, dt)
        per_dispatch = dt / n_dispatches
        est = per_dispatch if est is None else min(est, per_dispatch)
        if runs >= min_runs and best_dt / n_dispatches <= stall_factor * est:
            return best_dt, False
    return best_dt, (best_dt / n_dispatches > stall_factor * est)


def _throughput(score, device, batch, warmup, iters, scan_score=None,
                scan_chunk=5, max_chunks=100, return_info=False):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, size=(batch, 224, 224, 3), dtype=np.uint8), device
    )
    stack = jax.jit(lambda xs: jnp.stack(xs))
    if scan_score is None:
        # only the per-batch graph is timed — don't pay the (remote) compile
        # of a graph the scan protocol would never use, and vice versa
        for _ in range(warmup):
            np.asarray(score(images))  # host fetch == real completion barrier
    if scan_score is not None:
        # steady-state protocol: scan_chunk batches per dispatch via
        # lax.scan (distinct pre-staged batches), scores stay on device,
        # ONE final fetch — the validator's real consumption pattern
        def stage(chunk):
            return jax.device_put(
                rng.integers(
                    0, 255, size=(chunk, batch, 224, 224, 3), dtype=np.uint8
                ),
                device,
            )

        images_n = stage(scan_chunk)
        for _ in range(max(1, warmup)):  # warm the scan graph
            np.asarray(scan_score(images_n))
        # adaptive chunk: a dispatch must cover ~>=1 s of device work, or the
        # tunnel's per-dispatch turnaround pollutes the measurement (ResNet
        # read 5790 at chunk=5, 12415 at 20, 13739 at 60 — device ceiling
        # 14400). One growth round, capped at 100 chunks (=1.9 GB uint8 at
        # B=128; the scores the chunks produce stay on device either way).
        t0 = time.perf_counter()
        np.asarray(scan_score(images_n))
        dt1 = time.perf_counter() - t0
        if dt1 < 1.0:
            grown = min(max_chunks, int(np.ceil(scan_chunk * 1.0 / max(dt1, 1e-3))))
            if grown > scan_chunk:
                scan_chunk = grown
                images_n = stage(scan_chunk)
                for _ in range(max(1, warmup)):  # new shape → new compile
                    np.asarray(scan_score(images_n))
        # warm probe of the FINAL graph: best-of-2 single dispatches seed the
        # per-dispatch estimate the stall guard compares timed runs against
        # (the ~24 ms fetch roundtrip each probe pays is noise at >=0.8 s)
        est = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(scan_score(images_n))
            est = min(est, time.perf_counter() - t0)
        n_chunks = _plan_dispatches(est, iters, scan_chunk)

        def run_once():
            t0 = time.perf_counter()
            outs = [scan_score(images_n) for _ in range(n_chunks)]
            np.asarray(stack(outs))
            return time.perf_counter() - t0

        best_dt, stalled = _measure_with_stall_guard(run_once, n_chunks, est)
        ips = batch * scan_chunk * n_chunks / best_dt
        if return_info:
            return ips, {"stall_suspect": stalled, "n_dispatches": n_chunks,
                         "scan_chunk": scan_chunk}
        return ips
    # pipelined dispatch, device-side score accumulation, ONE final fetch.
    if device.platform == "cpu":
        # no tunnel → no stalls: plain single timed run (the stall
        # protocol would ~2.3x the already-slow 1-core CPU baseline for
        # nothing; stall_suspect=False is honest here)
        t0 = time.perf_counter()
        outs = [score(images) for _ in range(iters)]
        np.asarray(stack(outs))
        dt = time.perf_counter() - t0
        ips = batch * iters / dt
        if return_info:
            return ips, {"stall_suspect": False, "n_dispatches": iters,
                         "scan_chunk": None}
        return ips
    # Accelerator: same stall protocol as the scan branch (advisor r4:
    # this branch used to run once unguarded yet report
    # stall_suspect=False) INCLUDING the >=6-dispatch / >=4 s timed floor
    # (review r5: the CLAUDE.md driver contract promises the floor in
    # every mode). The warm probe's single dispatch+fetch over-estimates
    # the pipelined per-dispatch cost, so the guard is conservative, but
    # a BENCH_r03-class 5x stall still trips it.
    est = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(score(images))
        est = min(est, time.perf_counter() - t0)
    iters = _plan_dispatches(est, iters, 1)

    def run_once():
        t0 = time.perf_counter()
        outs = [score(images) for _ in range(iters)]
        np.asarray(stack(outs))
        return time.perf_counter() - t0

    best_dt, stalled = _measure_with_stall_guard(run_once, iters, est)
    ips = batch * iters / best_dt
    if return_info:
        return ips, {"stall_suspect": stalled, "n_dispatches": iters,
                     "scan_chunk": None}
    return ips


def build_model_score(name: str, device, dtypes, batch: int, img: int = 224):
    """Generic scan-of-batches scorer for ANY registry key (enc_* or ae_*):
    uint8 images → forward → scalar reduction on device (nothing big ever
    crosses the tunnel). Returns (scan_score, per_batch_score)."""
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.registry import get_model

    model = get_model(name, img, dtypes)
    is_ae = name.startswith("ae_")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        k = jax.random.key(0)
        if is_ae:
            variables = model.init(
                k, jnp.zeros((1, img, img, 3), jnp.float32), train=True
            )
        else:
            variables = model.init(k, jnp.zeros((1, img, img, 3), jnp.float32))
        mean, std = default_norm_stats()
        mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)
    variables = jax.device_put(variables, device)
    mean_j = jax.device_put(mean_j, device)
    std_j = jax.device_put(std_j, device)

    def fwd(v, images_u8):
        x = preprocess(images_u8, mean_j, std_j)
        if is_ae:
            out = model.apply(v, x, train=False)
            err = jnp.square(
                out.reconstruction.astype(jnp.float32) - x.astype(jnp.float32)
            )
            return jnp.mean(err, axis=(1, 2, 3))  # [B] anomaly scores
        out = model.apply(v, x)
        return jnp.sum(out.patch_embedding.astype(jnp.float32), axis=(1, 2))

    def chunk(v, ims):
        return jax.lax.scan(lambda _, im: (None, fwd(v, im)), None, ims)[1]

    chunk_j = jax.jit(chunk)
    fwd_j = jax.jit(fwd)
    return (lambda ims: chunk_j(variables, ims)), (lambda im: fwd_j(variables, im))


def _backbone_flops(name: str):
    """flops/img from tools/backbone_flops.json (written by
    `tools/bench_backbones.py --flops` on the CPU backend)."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools",
        "backbone_flops.json",
    )
    if not os.path.exists(path):
        return None
    with open(path) as f:
        table = json.load(f)
    return table.get(name)


V5E_BF16_PEAK = 197e12  # TFLOPS, bf16 MXU peak per v5e chip


def bench_backbone(name: str, batch: int = None, iters: int = ITERS) -> dict:
    """Measure one registry key on the accelerator; returns the result dict
    (img/s + MFU when the FLOP table is present)."""
    import jax

    from vit_ad_tpu.config import DtypePolicy

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    device = accel[0] if accel else jax.devices()[0]
    if batch is None:
        batch = 32 if name.startswith("ae_") else BATCH
    scan_score, _ = build_model_score(name, device, DtypePolicy(), batch)
    # 20 batches per dispatch: the fast trunks (ResNet 8.9 ms/batch on
    # device per the r3 trace) finish a 5-batch chunk faster than the
    # axon tunnel turns a dispatch around, so chunk=5 measured the tunnel,
    # not the chip (ResNet read 5790 while its device ceiling is ~14000).
    # Streaming N batches per dispatch with scores kept on device is still
    # exactly the validator's consumption pattern. [20,B,224,224,3] uint8
    # = 385 MB pre-staged — fine in 16 GB.
    scan_chunk = int(os.environ.get("BENCH_CHUNK", 20))
    # stall guard (see _measure_with_stall_guard): best-of->=2 timed runs,
    # stalled runs (per-dispatch wall >> warm-probe estimate) retried
    ips, info = _throughput(
        lambda im: None, device, batch, WARMUP, max(iters, 2 * scan_chunk),
        scan_score=scan_score, scan_chunk=scan_chunk, return_info=True,
    )
    out = {
        "metric": f"images/sec/chip ({name} forward, 224px, bf16)",
        "value": round(ips, 2),
        "unit": "img/s",
        "batch": batch,
    }
    if info["stall_suspect"]:
        out["stall_suspect"] = True
    fl = _backbone_flops(name)
    if fl:
        out["gflops_per_img"] = round(fl / 1e9, 2)
        out["mfu"] = round(ips * fl / V5E_BF16_PEAK, 4)
    return out


def bench_latency(name: str = None, iters: int = 2000) -> dict:
    """Serving latency: steady-state device ms/img at batch 1.

    Measured scan-amortized (a lax.scan of B=1 forwards over pre-staged
    distinct images, one final fetch), i.e. the pipelined per-image device
    latency a serving stream sees once warm. Host dispatch overhead is
    excluded by construction — on a locally-attached TPU it is ~µs; on the
    axon tunnel the first image of a stream additionally pays the ~24 ms
    roundtrip. B=1 stages are tiny (224²·3 uint8/img), so the adaptive
    dispatch-growth cap is lifted to `iters` chunks (~0.3 GB at 2000).
    `name=None` measures the flagship DeiT-base+NF-20 pipeline."""
    import jax

    from vit_ad_tpu.config import DtypePolicy

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    device = accel[0] if accel else jax.devices()[0]
    if name is None:
        _, scan_score = _build(device, DtypePolicy(), fused=True)
        label = "DeiT-base+NF-20 inference"
    else:
        scan_score, _ = build_model_score(name, device, DtypePolicy(), batch=1)
        label = f"{name} forward"
    ips, info = _throughput(
        lambda im: None, device, batch=1, warmup=WARMUP, iters=iters,
        scan_score=scan_score, scan_chunk=min(200, iters),
        max_chunks=iters, return_info=True,
    )
    out = {
        "metric": f"serving latency ({label}, B=1, steady-state device ms/img)",
        "value": round(1000.0 / ips, 3),
        "unit": "ms/img",
        "throughput_b1_img_s": round(ips, 1),
    }
    if info["stall_suspect"]:
        out["stall_suspect"] = True
    return out


def _cpu_reference() -> float:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["cpu_img_per_sec"]
    import jax

    from vit_ad_tpu.config import DtypePolicy

    cpu = jax.devices("cpu")[0]
    score, _ = _build(cpu, DtypePolicy.f32(), fused=False)
    val = _throughput(score, cpu, batch=4, warmup=1, iters=2)
    with open(CACHE, "w") as f:
        json.dump(
            {"cpu_img_per_sec": val,
             "note": "DeiT-base+NF-20 224px f32 on host CPU (1 core)"}, f
        )
    return val


def _wait_for_backend() -> bool:
    """Bounded wait for the accelerator backend to come up.

    The axon tunnel occasionally drops for minutes at a time; a backend-init
    attempt against a down tunnel blocks ~25 min inside the plugin before
    failing, and the failure is cached process-wide by jax. Probe in a
    SUBPROCESS (so a failed probe doesn't poison this process's backend
    cache) and retry until BENCH_INIT_WAIT seconds (default 3600) are
    exhausted. Returns True when an accelerator answered (or a CPU run was
    explicitly requested), False when the budget ran out with the tunnel
    still down.
    """
    import subprocess
    import sys

    if (os.environ.get("VITAD_PLATFORM") or os.environ.get("JAX_PLATFORMS")) == "cpu":
        return True  # CPU run requested — there is no accelerator to wait for
    budget = float(os.environ.get("BENCH_INIT_WAIT", 3600))
    deadline = time.time() + budget
    # assert: jax initializing with only CPU devices (silent accelerator
    # fallback) must exit nonzero, or the wait returns on a down tunnel
    probe = "import jax; assert [d for d in jax.devices() if d.platform != 'cpu']"
    while True:
        rc = subprocess.call(
            [sys.executable, "-c", probe],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        if rc == 0:
            return True
        if time.time() >= deadline:
            return False
        time.sleep(min(60.0, max(1.0, deadline - time.time())))


def _backend_unavailable_exit() -> None:
    """Emit an explicit infra-failure JSON line and exit nonzero.

    Without this, an exhausted wait would fall through to jax.devices(),
    which silently falls back to the host CPU and records the flagship at
    ~60 img/s — an apparent 50x regression that is really a dead tunnel.
    An honest failure marker beats a misleading number.
    """
    import sys

    print(
        json.dumps(
            {
                "metric": "images/sec/chip (DeiT-base+NF-20 inference, 224px, bf16)",
                "value": 0,
                "unit": "img/s",
                "error": "accelerator backend unavailable after BENCH_INIT_WAIT; "
                         "refusing to substitute a host-CPU measurement",
            }
        )
    )
    sys.exit(1)


def main() -> None:
    if not _wait_for_backend():
        _backend_unavailable_exit()
    import jax

    from vit_ad_tpu.config import DtypePolicy

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    device = accel[0] if accel else jax.devices()[0]
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    use_scan = os.environ.get("BENCH_SCAN", "1") != "0"
    batch = int(os.environ.get("BENCH_BATCH", BATCH))
    score, scan_score = _build(device, DtypePolicy(), fused=fused)
    # chunk=20 for the same reason as bench_backbone: at 41.5 ms/batch the
    # flagship's 5-batch chunks still leaked ~2% to the tunnel turnaround.
    # The driver-contract path gets the SAME stall guard as --backbone mode:
    # BENCH_r03 (580 img/s for a 3084 img/s graph) was exactly 2 stalled
    # dispatches with no retry — the one number the round is judged on must
    # be the best-defended measurement in the file, not the least.
    tpu_ips, info = _throughput(
        score, device, batch, WARMUP, max(ITERS, 40),
        scan_score=scan_score if use_scan else None, scan_chunk=20,
        return_info=True,
    )
    cpu_ips = _cpu_reference()

    result = {
        "metric": "images/sec/chip (DeiT-base+NF-20 inference, 224px, bf16)",
        "value": round(tpu_ips, 2),
        "unit": "img/s",
        "vs_baseline": round(tpu_ips / (5.0 * cpu_ips), 3),
    }
    if info["stall_suspect"]:
        result["stall_suspect"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    if "--latency" in sys.argv:
        # serving-latency mode: B=1 steady-state device ms/img, flagship by
        # default or any registry key via --backbone
        name = None
        if "--backbone" in sys.argv:
            name = sys.argv[sys.argv.index("--backbone") + 1]
        if not _wait_for_backend():
            _backend_unavailable_exit()
        print(json.dumps(bench_latency(name)))
    elif "--backbone" in sys.argv:
        # per-backbone mode (round-2 VERDICT item 7): one JSON line for any
        # registry key, so future BENCH rounds can track more than the
        # flagship. The no-arg invocation (driver contract) is unchanged.
        name = sys.argv[sys.argv.index("--backbone") + 1]
        if not _wait_for_backend():
            _backend_unavailable_exit()
        print(json.dumps(bench_backbone(name)))
    else:
        main()
