"""Optimization-variant shootout for the flagship fused inference graph.

Device time via the launch-N/one-fetch protocol (dispatch/fetch roundtrips
on the axon tunnel cost ~30 ms; timing per-iter with per-iter fetches
measures the tunnel, not the TPU).

Variants (cumulative winners productize into bench.py / eval):
  base          fused graph as bench.py builds it (encoder scan, f32 flow)
  unroll        encoder block scan fully unrolled (kills while-loop copies)
  flow-bf16     flow convs+permutations feed the MXU in bf16 (f32 accum)
  unroll+bf16   both
  +gelu-tanh    and tanh-approximated GELU (measurement only; exact-erf GELU
                is the parity default)

Run:  PYTHONPATH=.:/root/.axon_site python tools/profile_variants.py
"""

from __future__ import annotations

import time

import numpy as np

B = 128
N_LAUNCH = 8
ROUNDS = 3


def exec_time(fn, *args):
    import jax.numpy as jnp

    np.asarray(fn(*args))  # warm
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(N_LAUNCH)]
        np.asarray(jnp.stack(outs))
        best = min(best, (time.perf_counter() - t0) / N_LAUNCH)
    return best


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
    print(f"device: {device}  batch: {B}", flush=True)

    img = 224
    dtypes = DtypePolicy()
    enc0 = deit_base_distilled_patch16(img, dtypes)
    cpu = jax.devices("cpu")[0]
    side = int(np.sqrt(enc0.num_patches))

    def flow_mod(mmdt):
        return NormalizingFlow(
            num_channels=enc0.embed_dim, img_size=img,
            num_patches=enc0.num_patches, hidden_ratio=0.16, flow_steps=20,
            dtypes=dtypes, matmul_dtype=mmdt,
        )

    with jax.default_device(cpu):
        k1, k2 = jax.random.split(jax.random.key(0))
        ep = enc0.init(k1, jnp.zeros((1, img, img, 3), jnp.float32))
        fp = flow_mod(jnp.float32).init(
            k2, jnp.zeros((1, side, side, enc0.embed_dim), jnp.float32)
        )
        mean, std = default_norm_stats()
        mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)
    ep, fp = jax.device_put(ep, device), jax.device_put(fp, device)
    mean_j, std_j = jax.device_put(mean_j, device), jax.device_put(std_j, device)

    rng = np.random.default_rng(0)
    im = jax.device_put(
        rng.integers(0, 255, size=(B, img, img, 3), dtype=np.uint8), device
    )

    def build(encoder, flow):
        def fused(ep, fp, im):
            x = preprocess(im, mean_j, std_j)
            f = encoder.apply(ep, x).patch_embedding
            out = flow.apply(fp, patch_tokens_to_map(f))
            am = out.anomaly_score_map
            return jnp.max(am.reshape(am.shape[0], -1), axis=1)
        return jax.jit(fused)

    enc_unrolled = enc0.clone(scan_unroll=enc0.depth)
    variants = [
        # defaults now: packed-qkv Pallas attention + tanh GELU under bf16
        ("base (packed+tanh)", enc0, jnp.float32),
        ("gelu-erf", enc0.clone(gelu_tanh=False), jnp.float32),
        ("unroll", enc_unrolled, jnp.float32),
        ("flow-bf16", enc0, jnp.bfloat16),
        ("unroll+flow-bf16", enc_unrolled, jnp.bfloat16),
    ]

    ref_scores = None
    for name, enc, mmdt in variants:
        try:
            fn = build(enc, flow_mod(mmdt))
            scores = np.asarray(fn(ep, fp, im))
            if ref_scores is None:
                ref_scores = scores
            drift = float(np.max(np.abs(scores - ref_scores)))
            t = exec_time(fn, ep, fp, im)
            print(
                f"{name:26s} {t*1e3:8.2f} ms  {B/t:7.1f} img/s  "
                f"max|Δscore|={drift:.2e}",
                flush=True,
            )
        except Exception as e:
            print(f"{name:26s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
