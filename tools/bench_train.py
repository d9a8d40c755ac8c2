"""Training-step throughput on the TPU (round-2 VERDICT item 3).

Measures steady-state train img/s (compile excluded, donated buffers, one
fetch per measurement) for the three hot training loops of the reference:

  nf      — NF-head step on cached DeiT-base features (the flagship's
            training path; reference src/pipeline/LearnerNF.py:129-151)
  mdn     — MDN K=100 head step on cached features (LearnerMDN.py:140-169)
  recon   — ae_deit full-graph step (frozen encoder fwd + decoder train,
            LearnerRecon.py:390-502) and the latent-cached decoder-only
            step the trainer actually uses (pipeline/train.py latent cache)

The step functions mirror pipeline/train.py's train_nf / train_mdn /
train_recon jit steps exactly (same loss math, same torch-Adam, same
donation). Batches are pre-staged on device; each timed run dispatches N
steps back-to-back and fetches ONE loss scalar (axon rules, PERF.md).

Writes tools/train_bench.json and prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT_PATH = os.path.join(ROOT, "tools", "train_bench.json")
IMG = 224
P, D = 196, 768  # DeiT-base/16 at 224px


def _device():
    import jax

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    return accel[0] if accel else jax.devices()[0]


def _time_steps(step, state, batches, warmup, iters):
    """state = (params, opt_state); batches = list of on-device step args.
    Returns steady-state seconds/step. Params/opt donate-rotate through the
    loop; the single np.asarray on the last loss is the completion barrier."""
    for i in range(warmup):
        state = step(state, batches[i % len(batches)])
    np.asarray(state[-1])  # sync after warmup/compile
    t0 = time.perf_counter()
    for i in range(iters):
        state = step(state, batches[i % len(batches)])
    np.asarray(state[-1])
    return (time.perf_counter() - t0) / iters


def bench_nf(batch, warmup=4, iters=30, flow_steps=20, hidden_ratio=0.16):
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import DtypePolicy
    from vit_ad_tpu.models.flow import NormalizingFlow, patch_tokens_to_map
    from vit_ad_tpu.pipeline.optimizers import torch_adam

    device = _device()
    dtypes = DtypePolicy()
    flow = NormalizingFlow(
        num_channels=D, img_size=IMG, num_patches=P,
        hidden_ratio=hidden_ratio, flow_steps=flow_steps, dtypes=dtypes,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        side = int(np.sqrt(P))
        params = flow.init(
            jax.random.key(0), jnp.zeros((1, side, side, D), jnp.float32)
        )
    params = jax.device_put(params, device)
    tx = torch_adam(1e-3, 1e-5)
    opt_state = jax.jit(tx.init)(params)

    # identical to pipeline/train.py train_nf masked_loss/train_step
    def masked_loss(params, feats, valid):
        fmap = patch_tokens_to_map(feats)
        z, logdet = flow.apply(params, fmap, method=NormalizingFlow.transform)
        per_example = 0.5 * jnp.sum(z * z, axis=(1, 2, 3)) - logdet
        return jnp.sum(per_example * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feats, valid):
        loss, grads = jax.value_and_grad(masked_loss)(params, feats, valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    batches = [
        (
            jax.device_put(
                rng.normal(size=(batch, P, D)).astype(np.float32), device
            ),
            jax.device_put(np.ones(batch, np.float32), device),
        )
        for _ in range(4)
    ]

    def step(state, args):
        p, o, _ = state if len(state) == 3 else (*state, None)
        return train_step(p, o, *args)

    sec = _time_steps(step, (params, opt_state, jnp.zeros(())), batches,
                      warmup, iters)
    return batch / sec


def bench_mdn(batch, warmup=4, iters=30, num_gaussians=100):
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.pipeline.optimizers import torch_adam

    device = _device()
    mdn = GaussianMDN(features=D, num_gaussians=num_gaussians)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = mdn.init(jax.random.key(0), jnp.zeros((1, 1, D)))
    params = jax.device_put(params, device)
    tx = torch_adam(1e-3, 1e-4)
    opt_state = jax.jit(tx.init)(params)

    # identical to pipeline/train.py train_mdn masked_loss/train_step
    def masked_loss(params, feats, valid, step_rng):
        ll = mdn.apply(
            params, feats, rng=step_rng, method=GaussianMDN.log_likelihood
        )
        per_example = -jnp.mean(ll, axis=(1, 2))
        return jnp.sum(per_example * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feats, valid, step_rng):
        loss, grads = jax.value_and_grad(masked_loss)(
            params, feats, valid, step_rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    key = jax.device_put(jax.random.key(7), device)
    batches = [
        (
            jax.device_put(
                rng.normal(size=(batch, P, D)).astype(np.float32), device
            ),
            jax.device_put(np.ones(batch, np.float32), device),
            key,
        )
        for _ in range(4)
    ]

    def step(state, args):
        p, o, _ = state
        return train_step(p, o, *args)

    sec = _time_steps(step, (params, opt_state, jnp.zeros(())), batches,
                      warmup, iters)
    return batch / sec


def bench_mdn_stage(batch, warmup=4, iters=30, d=2048, p=49,
                    num_gaussians=50):
    """ResNet-stage MDN head step (train_mdn_resnet's per-stage work,
    pipeline/train.py:674-690): K=50 over a [B, P, D] stage map, with
    feature gradients REQUESTED (the trainer differentiates the stage
    norms through the head, so d(x) is live — this exercises the
    bwd_x kernels, which the cached-feature MDN path DCEs away).
    Stage shapes at 224px: stage-2 d=1024 p=196, stage-3 d=2048 p=49."""
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.pipeline.optimizers import torch_adam

    device = _device()
    mdn = GaussianMDN(features=d, num_gaussians=num_gaussians)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = mdn.init(jax.random.key(0), jnp.zeros((1, 1, d)))
    params = jax.device_put(params, device)
    tx = torch_adam(1e-3, 1e-4)
    opt_state = jax.jit(tx.init)(params)

    def masked_loss(params, feats, valid, step_rng):
        ll = mdn.apply(
            params, feats, rng=step_rng, method=GaussianMDN.log_likelihood
        )
        per_example = -jnp.mean(ll, axis=(1, 2))
        return jnp.sum(per_example * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feats, valid, step_rng):
        # argnums=(0, 1): the feature cotangent is consumed (summed into
        # the loss scalar) so XLA cannot DCE the bwd_x kernel — mirrors
        # the stage norms differentiating through the head
        loss, (grads, gfeats) = jax.value_and_grad(
            masked_loss, argnums=(0, 1)
        )(params, feats, valid, step_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        loss = loss + 0.0 * jnp.sum(gfeats)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    key = jax.device_put(jax.random.key(7), device)
    batches = [
        (
            jax.device_put(
                rng.normal(size=(batch, p, d)).astype(np.float32), device
            ),
            jax.device_put(np.ones(batch, np.float32), device),
            key,
        )
        for _ in range(4)
    ]

    def step(state, args):
        pr, o, _ = state
        return train_step(pr, o, *args)

    sec = _time_steps(step, (params, opt_state, jnp.zeros(())), batches,
                      warmup, iters)
    return batch / sec


def bench_recon(batch, warmup=3, iters=20, cached=False):
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import DtypePolicy
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.pipeline.optimizers import torch_adam
    from vit_ad_tpu.pipeline.train import _freeze_mask
    from vit_ad_tpu.registry import get_model

    import optax

    device = _device()
    dtypes = DtypePolicy()
    model = get_model("ae_deit", IMG, dtypes)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32),
            train=True,
        )
        mean, std = default_norm_stats()
        mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)
    params = jax.device_put(variables["params"], device)
    batch_stats = jax.device_put(variables.get("batch_stats", {}), device)
    mean_j = jax.device_put(mean_j, device)
    std_j = jax.device_put(std_j, device)

    base_tx = torch_adam(1e-3, 1e-4)
    labels = _freeze_mask({"params": params}, ("decoder",))["params"]
    tx = optax.multi_transform(
        {"train": base_tx, "freeze": optax.set_to_zero()}, labels
    )
    opt_state = jax.jit(tx.init)(params)

    def _decode(params, batch_stats, z):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            z, train=True, mutable=["batch_stats"],
            method=lambda m, zz, train: m.decoder(zz, train=train),
        )

    # identical to pipeline/train.py train_recon loss_fn (MSE branch)
    def loss_fn(params, batch_stats, images_u8, valid, latents=None):
        x = preprocess(images_u8, mean_j, std_j)
        if latents is not None:
            recon, updates = _decode(params, batch_stats, latents)
        else:
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            recon = out.reconstruction
        recon = recon.astype(jnp.float32)
        err = jnp.mean(jnp.square(recon - x.astype(jnp.float32)), axis=(1, 2, 3))
        loss = jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss, updates["batch_stats"]

    # pipeline/train.py's recon train_step is un-donated (decoder-only
    # params are small); mirror it exactly
    @jax.jit
    def train_step(params, batch_stats, opt_state, images_u8, valid):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images_u8, valid
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            jax.tree.map(lambda p, u: p + u, params, updates),
            new_stats, opt_state, loss,
        )

    @jax.jit
    def train_step_cached(params, batch_stats, opt_state, images_u8, valid, z):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images_u8, valid, z
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            jax.tree.map(lambda p, u: p + u, params, updates),
            new_stats, opt_state, loss,
        )

    rng = np.random.default_rng(0)
    latent_dim = D
    batches = []
    for _ in range(4):
        args = [
            jax.device_put(
                rng.integers(0, 255, size=(batch, IMG, IMG, 3), dtype=np.uint8),
                device,
            ),
            jax.device_put(np.ones(batch, np.float32), device),
        ]
        if cached:
            args.append(jax.device_put(
                rng.normal(size=(batch, latent_dim)).astype(np.float32), device
            ))
        batches.append(tuple(args))

    fn = train_step_cached if cached else train_step

    def step(state, args):
        p, bs, o, _ = state
        return fn(p, bs, o, *args)

    sec = _time_steps(
        step, (params, batch_stats, opt_state, jnp.zeros(())), batches,
        warmup, iters,
    )
    return batch / sec


BENCHES = {
    "nf": bench_nf,
    "mdn": bench_mdn,
    "mdn_stage2": lambda b, **kw: bench_mdn_stage(b, d=1024, p=196, **kw),
    "mdn_stage3": lambda b, **kw: bench_mdn_stage(b, d=2048, p=49, **kw),
    "recon": lambda b, **kw: bench_recon(b, cached=False, **kw),
    "recon_cached": lambda b, **kw: bench_recon(b, cached=True, **kw),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="nf,mdn,recon,recon_cached")
    ap.add_argument("--batches", default="32,128")
    ap.add_argument("--tag", default="",
                    help="cache-key suffix (e.g. _pallas) so env-gated "
                         "variants get their own rows")
    args = ap.parse_args()

    rows = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            rows = json.load(f)
    for which in args.which.split(","):
        for b in [int(x) for x in args.batches.split(",")]:
            key = f"{which}_b{b}{args.tag}"
            if rows.get(key) is not None:  # null = prior failure → retry
                print(f"{key}: cached {rows[key]:.1f} img/s")
                continue
            try:
                ips = BENCHES[which](b)
                rows[key] = round(ips, 1)
                print(json.dumps({
                    "metric": f"train img/s ({which}{args.tag}, batch {b})",
                    "value": rows[key], "unit": "img/s",
                }))
            except Exception as e:
                print(f"{key}: FAILED {type(e).__name__}: {e}")
                rows[key] = None
            with open(OUT_PATH, "w") as f:
                json.dump(rows, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
