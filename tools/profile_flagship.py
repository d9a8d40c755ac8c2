"""Ablation profiler for the flagship inference graph (DeiT-base + NF-20).

axon-runtime rule discovered empirically: device->host fetches ride a slow
tunnel (~10-20 MB/s), so EVERY timed variant must return a scalar reduction
— otherwise you are timing the tunnel, not the TPU. Times:

  * no-op dispatch (tunnel roundtrip + dispatch overhead)
  * preprocess only (uint8 -> normalized f32, sum-reduced)
  * encoder only (DeiT-base, bf16, sum-reduced)
  * flow transform (z+logdet, sum-reduced) on precomputed features
  * 20x permutation matmuls alone (sum-reduced)
  * flow WITHOUT permutations (identity perms, sum-reduced)
  * fused end-to-end (max score per image, [B])
  * fused, N batches under one dispatch via lax.scan ([N,B] scores)

Run:  PYTHONPATH=. python tools/profile_flagship.py [--batch 128]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(name, fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.tree_util.tree_leaves(o)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--scan-batches", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import DtypePolicy
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.models.flow import (
        NormalizingFlow,
        _permute_channels,
        patch_tokens_to_map,
    )
    from vit_ad_tpu.models.vit import deit_base_distilled_patch16

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    device = accel[0] if accel else jax.devices()[0]
    print(f"device: {device}  batch: {args.batch}", flush=True)

    img = 224
    dtypes = DtypePolicy()
    encoder = deit_base_distilled_patch16(img, dtypes)
    flow = NormalizingFlow(
        num_channels=encoder.embed_dim, img_size=img,
        num_patches=encoder.num_patches, hidden_ratio=0.16, flow_steps=20,
        dtypes=dtypes,
    )
    flow_noperm = NormalizingFlow(
        num_channels=encoder.embed_dim, img_size=img,
        num_patches=encoder.num_patches, hidden_ratio=0.16, flow_steps=20,
        dtypes=dtypes,
        perms=tuple(tuple(range(encoder.embed_dim)) for _ in range(20)),
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        k1, k2 = jax.random.split(jax.random.key(0))
        ep = encoder.init(k1, jnp.zeros((1, img, img, 3), jnp.float32))
        side = int(np.sqrt(encoder.num_patches))
        fp = flow.init(k2, jnp.zeros((1, side, side, encoder.embed_dim), jnp.float32))
        mean, std = default_norm_stats()
        mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)
    ep = jax.device_put(ep, device)
    fp = jax.device_put(fp, device)
    mean_j = jax.device_put(mean_j, device)
    std_j = jax.device_put(std_j, device)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, size=(args.batch, img, img, 3), dtype=np.uint8), device
    )
    feats = jax.device_put(
        rng.standard_normal((args.batch, side, side, encoder.embed_dim)).astype(np.float32),
        device,
    )
    perm = jax.device_put(
        np.random.default_rng(0).permutation(encoder.embed_dim).astype(np.int32), device
    )

    noop_j = jax.jit(lambda im: im[0, 0, 0, 0].astype(jnp.int32))
    pre_j = jax.jit(lambda im: preprocess(im, mean_j, std_j).sum())
    enc_j = jax.jit(
        lambda ep, im: encoder.apply(
            ep, preprocess(im, mean_j, std_j)
        ).patch_embedding.sum()
    )

    def flow_sum(fp, f, mod):
        z, logdet = mod.apply(fp, f, method=NormalizingFlow.transform)
        return z.sum() + logdet.sum()

    flow_j = jax.jit(lambda fp, f: flow_sum(fp, f, flow))
    flow_noperm_j = jax.jit(lambda fp, f: flow_sum(fp, f, flow_noperm))
    flow_full_j = jax.jit(
        lambda fp, f: flow.apply(fp, f).anomaly_score_map.max(axis=(1, 2))
    )

    def perms_only(f):
        def body(z, _):
            return _permute_channels(z, perm), None
        z, _ = jax.lax.scan(body, f, None, length=20)
        return z.sum()
    perms_j = jax.jit(perms_only)

    def fused(ep, fp, im):
        x = preprocess(im, mean_j, std_j)
        f = encoder.apply(ep, x).patch_embedding
        out = flow.apply(fp, patch_tokens_to_map(f))
        am = out.anomaly_score_map
        return jnp.max(am.reshape(am.shape[0], -1), axis=1)

    fused_j = jax.jit(fused)

    def fused_scan(ep, fp, ims):  # ims: [N, B, H, W, 3] u8 -> [N, B] scores
        def body(_, im):
            return None, fused(ep, fp, im)
        _, scores = jax.lax.scan(body, None, ims)
        return scores

    fused_scan_j = jax.jit(fused_scan)
    n_scan = args.scan_batches
    images_n = jax.device_put(
        rng.integers(0, 255, size=(n_scan, args.batch, img, img, 3), dtype=np.uint8),
        device,
    )

    it = args.iters
    t_noop = timeit("no-op dispatch", noop_j, images, iters=it)
    t_pre = timeit("preprocess only (sum)", pre_j, images, iters=it)
    t_enc = timeit("encoder incl. preprocess (sum)", enc_j, ep, images, iters=it)
    t_perm = timeit("20x permutation matmul f32 (sum)", perms_j, feats, iters=it)
    t_flow = timeit("flow transform (sum)", flow_j, fp, feats, iters=it)
    t_fnp = timeit("flow transform, identity perms (sum)", flow_noperm_j, fp, feats, iters=it)
    t_fmap = timeit("flow + score map + max ([B])", flow_full_j, fp, feats, iters=it)
    t_full = timeit("fused end-to-end ([B])", fused_j, ep, fp, images, iters=it)
    t_scan = timeit(
        f"fused x{n_scan} batches, one dispatch", fused_scan_j, ep, fp, images_n,
        iters=max(2, it // 3),
    )

    b = args.batch
    print(flush=True)
    print(f"dispatch overhead:        {t_noop*1e3:8.2f} ms", flush=True)
    print(f"encoder img/s:            {b / (t_enc - t_noop):8.1f}", flush=True)
    print(f"flow img/s:               {b / (t_flow - t_noop):8.1f}", flush=True)
    print(f"flow-noperm img/s:        {b / (t_fnp - t_noop):8.1f}", flush=True)
    print(f"fused img/s:              {b / t_full:8.1f}", flush=True)
    print(f"fused-scan img/s:         {b * n_scan / t_scan:8.1f}", flush=True)


if __name__ == "__main__":
    main()
