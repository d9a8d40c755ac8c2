"""Dispatch-overhead methodology experiments for the axon-tunnel TPU.

Findings from profile_flagship.py: a no-op dispatch+fetch costs ~30 ms, the
encoder computes in ~25 ms, so the steady-state loop is latency-bound, not
compute-bound. These experiments separate the levers:

  1. launch N batches with NO intermediate fetch, device-stack the scores,
     fetch once -> is the dispatch RPC itself async?
  2. batch-size scaling (128/256/512) -> amortize fixed overhead
  3. fused graph with XLA vs Pallas attention -> source of the fused penalty
  4. lax.scan slowdown: scan over 4 batches, XLA vs Pallas attention

Run:  PYTHONPATH=.:/root/.axon_site python tools/profile_dispatch.py
"""

from __future__ import annotations

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import DtypePolicy
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.models.flow import NormalizingFlow, patch_tokens_to_map
    from vit_ad_tpu.models.vit import deit_base_distilled_patch16

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    device = accel[0] if accel else jax.devices()[0]
    print(f"device: {device}", flush=True)

    img = 224
    dtypes = DtypePolicy()
    encoder = deit_base_distilled_patch16(img, dtypes)
    flow = NormalizingFlow(
        num_channels=encoder.embed_dim, img_size=img,
        num_patches=encoder.num_patches, hidden_ratio=0.16, flow_steps=20,
        dtypes=dtypes,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        k1, k2 = jax.random.split(jax.random.key(0))
        ep = encoder.init(k1, jnp.zeros((1, img, img, 3), jnp.float32))
        side = int(np.sqrt(encoder.num_patches))
        fp = flow.init(k2, jnp.zeros((1, side, side, encoder.embed_dim), jnp.float32))
        mean, std = default_norm_stats()
        mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)
    ep, fp = jax.device_put(ep, device), jax.device_put(fp, device)
    mean_j, std_j = jax.device_put(mean_j, device), jax.device_put(std_j, device)

    def fused(ep, fp, im):
        x = preprocess(im, mean_j, std_j)
        f = encoder.apply(ep, x).patch_embedding
        out = flow.apply(fp, patch_tokens_to_map(f))
        am = out.anomaly_score_map
        return jnp.max(am.reshape(am.shape[0], -1), axis=1)

    fused_j = jax.jit(fused)
    stack_j = jax.jit(lambda xs: jnp.stack(xs))

    rng = np.random.default_rng(0)

    def make_images(b):
        return jax.device_put(
            rng.integers(0, 255, size=(b, img, img, 3), dtype=np.uint8), device
        )

    def run(name, fn, iters=8, warmup=2):
        for _ in range(warmup):
            fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
        return dt

    # --- 1. N dispatches, single device-side stack + one fetch --------------
    im128 = make_images(128)
    N = 10

    def launch_then_one_fetch():
        outs = [fused_j(ep, fp, im128) for _ in range(N)]
        np.asarray(stack_j(outs))  # single fetch of [N, B]

    t = run(f"{N} dispatches, device-stack, ONE fetch", launch_then_one_fetch, iters=4)
    print(f"    -> img/s: {N * 128 / t:8.1f}", flush=True)

    # --- 2. batch scaling, per-batch fetch ----------------------------------
    for b in (128, 256, 512):
        imb = make_images(b)
        def step(imb=imb):
            np.asarray(fused_j(ep, fp, imb))
        t = run(f"fused batch={b}, fetch each", step, iters=6)
        print(f"    -> img/s: {b / t:8.1f}", flush=True)

    # --- 3. batch scaling with one-fetch pipelining --------------------------
    for b in (256, 512):
        imb = make_images(b)
        def pipe(imb=imb):
            outs = [fused_j(ep, fp, imb) for _ in range(N)]
            np.asarray(stack_j(outs))
        t = run(f"{N}x fused batch={b}, ONE fetch", pipe, iters=3)
        print(f"    -> img/s: {N * b / t:8.1f}", flush=True)

    # --- 4. Pallas vs XLA attention in the fused graph -----------------------
    os.environ["VITAD_PALLAS_VIT_ATTN"] = "0"
    fused_xla_j = jax.jit(lambda ep, fp, im: fused(ep, fp, im))
    def step_xla():
        np.asarray(fused_xla_j(ep, fp, im128))
    t = run("fused batch=128 XLA-attention, fetch each", step_xla, iters=6)
    print(f"    -> img/s: {128 / t:8.1f}", flush=True)

    def pipe_xla():
        outs = [fused_xla_j(ep, fp, im128) for _ in range(N)]
        np.asarray(stack_j(outs))
    t = run(f"{N}x fused batch=128 XLA-attn, ONE fetch", pipe_xla, iters=3)
    print(f"    -> img/s: {N * 128 / t:8.1f}", flush=True)
    del os.environ["VITAD_PALLAS_VIT_ATTN"]

    # --- 5. scan over 4 batches, Pallas vs XLA attention ---------------------
    ims4 = jax.device_put(
        rng.integers(0, 255, size=(4, 128, img, img, 3), dtype=np.uint8), device
    )

    def fused_scan(ep, fp, ims):
        def body(_, im):
            return None, fused(ep, fp, im)
        _, scores = jax.lax.scan(body, None, ims)
        return scores

    scan_j = jax.jit(fused_scan)
    t = run("scan x4 batch=128 Pallas-attn", lambda: np.asarray(scan_j(ep, fp, ims4)), iters=4)
    print(f"    -> img/s: {4 * 128 / t:8.1f}", flush=True)

    os.environ["VITAD_PALLAS_VIT_ATTN"] = "0"
    scan_xla_j = jax.jit(lambda ep, fp, ims: fused_scan(ep, fp, ims))
    t = run("scan x4 batch=128 XLA-attn", lambda: np.asarray(scan_xla_j(ep, fp, ims4)), iters=4)
    print(f"    -> img/s: {4 * 128 / t:8.1f}", flush=True)
    del os.environ["VITAD_PALLAS_VIT_ATTN"]


if __name__ == "__main__":
    main()
