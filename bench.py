"""Benchmark: flagship inference throughput on the attached TPU chip.

Measures images/sec/chip for the DeiT-base(+NF head) anomaly-detection
inference path at 224px — the reference's north-star metric
(BASELINE.json: ">=5x CPU-reference inference throughput per v5e chip").

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec on TPU, "unit": "img/s",
   "vs_baseline": tpu / (5 * cpu_reference)}

vs_baseline >= 1.0 means the >=5x-over-CPU target is met. The CPU reference
(same fused graph on the host CPU, f32) is measured once and cached in
bench_cpu_baseline.json since it is slow and does not change.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_cpu_baseline.json")
BATCH = 32
WARMUP = 3
ITERS = 10


def _build(backend_device, dtypes):
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.models.flow import patch_tokens_to_map
    from vit_ad_tpu.models.vit import deit_base_distilled_patch16
    from vit_ad_tpu.models.flow import NormalizingFlow

    img = 224
    encoder = deit_base_distilled_patch16(img, dtypes)
    flow = NormalizingFlow(
        num_channels=encoder.embed_dim, img_size=img,
        num_patches=encoder.num_patches, hidden_ratio=0.16, flow_steps=20,
        dtypes=dtypes,
    )
    with jax.default_device(backend_device):
        k1, k2 = jax.random.split(jax.random.key(0))
        enc_params = encoder.init(k1, jnp.zeros((1, img, img, 3), jnp.float32))
        side = int(np.sqrt(encoder.num_patches))
        flow_params = flow.init(
            k2, jnp.zeros((1, side, side, encoder.embed_dim), jnp.float32)
        )
        mean, std = default_norm_stats()
        mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

        @jax.jit
        def score(images_u8):
            x = preprocess(images_u8, mean_j, std_j)
            feats = encoder.apply(enc_params, x).patch_embedding
            out = flow.apply(flow_params, patch_tokens_to_map(feats))
            im = jnp.max(out.anomaly_score_map.reshape(images_u8.shape[0], -1), axis=1)
            return im, out.anomaly_score_map

        return score


def _throughput(score, device, batch, warmup, iters) -> float:
    import jax

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, size=(batch, 224, 224, 3), dtype=np.uint8), device
    )
    for _ in range(warmup):
        jax.block_until_ready(score(images))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(score(images))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _cpu_reference() -> float:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["cpu_img_per_sec"]
    import jax

    from vit_ad_tpu.config import DtypePolicy

    cpu = jax.devices("cpu")[0]
    score = _build(cpu, DtypePolicy.f32())
    val = _throughput(score, cpu, batch=4, warmup=1, iters=2)
    with open(CACHE, "w") as f:
        json.dump({"cpu_img_per_sec": val, "note": "DeiT-base+NF 224px f32, host CPU"}, f)
    return val


def main() -> None:
    import jax

    from vit_ad_tpu.config import DtypePolicy

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    device = accel[0] if accel else jax.devices()[0]
    score = _build(device, DtypePolicy())
    tpu_ips = _throughput(score, device, BATCH, WARMUP, ITERS)
    cpu_ips = _cpu_reference()

    print(
        json.dumps(
            {
                "metric": "images/sec/chip (DeiT-base+NF-20 inference, 224px, bf16)",
                "value": round(tpu_ips, 2),
                "unit": "img/s",
                "vs_baseline": round(tpu_ips / (5.0 * cpu_ips), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
