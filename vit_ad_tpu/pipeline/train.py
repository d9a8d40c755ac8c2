"""Head training loops.

Functional redesign of the reference Learner classes (reference
src/pipeline/LearnerMDN.py, LearnerNF.py, LearnerRecon.py): each head gets a
pure jit-compiled step function over cached frozen-encoder features (or raw
images for trainable-encoder paths), an optax optimizer with torch-Adam
semantics, early stopping on validation loss, and a final metric evaluation.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_ad_tpu.config import HyperParams
from vit_ad_tpu.data.dataset import default_norm_stats
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.models.flow import NormalizingFlow, patch_tokens_to_map
from vit_ad_tpu.models.mdn import GaussianMDN
from vit_ad_tpu.parallel.context import MeshContext
from vit_ad_tpu.pipeline.early_stopping import EarlyStopping, run_epochs
from vit_ad_tpu.pipeline.features import (
    extract_features,
    make_feature_extractor,
    stage_feature_batches,
    stage_feature_epoch,
    image_epoch_staging,
    make_scan_epoch,
    make_valid_scan_epoch,
    use_scan_epochs,
)
from vit_ad_tpu.pipeline.optimizers import torch_adam
from vit_ad_tpu.registry import get_model


@dataclasses.dataclass
class TrainResult:
    head_params: Any
    encoder_params: Any
    history: Dict[str, List[float]]
    metrics: Dict[str, float]
    epochs_ran: int
    best_epoch: int
    best_valid_loss: float
    encoder: Optional[nn.Module] = None
    head: Optional[nn.Module] = None


def _weighted_mean(losses: List[Any], weights: List[float]) -> float:
    """Weighted mean of per-step device loss scalars with ONE device->host
    fetch. `float(loss)` inside the step loop blocks on the transfer every
    step (a full tunnel roundtrip on remote-attached TPUs and a pipeline
    stall everywhere); deferring lets the steps queue back-to-back on the
    device and pays the fetch once per epoch."""
    if not losses:
        return float("nan")
    vals = np.asarray(jax.device_get(jnp.stack(losses)), dtype=np.float64)
    return float(np.average(vals, weights=weights))


def _stacked_weighted_mean(losses: Any, weights: np.ndarray) -> float:
    """`_weighted_mean` for a scan epoch's [S] device loss vector — same
    f64 host math, so scan and loop epochs report identical history."""
    vals = np.asarray(jax.device_get(losses), dtype=np.float64)
    return float(np.average(vals, weights=weights))


def default_encoder_params(encoder: nn.Module, hp: HyperParams) -> Any:
    """Deterministic encoder init for a given seed — shared by trainers and
    validation_loop so a head checkpoint re-evaluates against the exact same
    (random or converted) encoder weights."""
    _, k = jax.random.split(jax.random.key(hp.seed))
    return encoder.init(
        k, jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32)
    )


def _norm_stats(hp: HyperParams, data: DataPipeline):
    """centering=True → dataset statistics (reference
    GeneralDataLoader.compute_mean_stdev); else ImageNet stats (reference
    startTraining_recon.py:95-96)."""
    if hp.centering:
        return data.compute_mean_std()
    return default_norm_stats()


def _shard(mc: Optional[MeshContext], *arrays):
    """Shard batch arrays over the mesh data axis, or pass through when no
    mesh is requested — lets every trainer loop stay one code path."""
    if mc is None:
        return arrays if len(arrays) != 1 else arrays[0]
    return mc.shard_batch(*arrays)


def _mesh_setup(hp: HyperParams) -> Optional[MeshContext]:
    """The trainers' mesh entry point: None (single-device, the default) or
    a validated MeshContext. New capability vs the reference (SURVEY.md
    §2.8 — the reference is strictly single-GPU); see parallel/context.py."""
    mc = MeshContext.from_hp(hp)
    if mc is not None:
        mc.check_batch(hp.batch_size)
    return mc


def train_mdn(
    hp: HyperParams,
    data: DataPipeline,
    test_data: Optional[DataPipeline] = None,
    encoder: Optional[nn.Module] = None,
    enc_params: Any = None,
    logger: Any = None,
    figures_dir: Optional[str] = None,
) -> TrainResult:
    """Train the GMM/MDN head on frozen-encoder features.

    Reference flow: LearnerMDN.learn_mdn_transformer (reference
    src/pipeline/LearnerMDN.py:97-240) — Adam over MDN params only, NLL loss,
    early stopping, final ValidatorMdn metrics."""
    from vit_ad_tpu.pipeline.eval import evaluate_mdn

    rng = jax.random.key(hp.seed)
    if encoder is None:
        encoder = get_model(hp.model_name, hp.img_size, hp.dtypes)
    if enc_params is None:
        rng, _ = jax.random.split(rng)
        enc_params = default_encoder_params(encoder, hp)

    mean, std = _norm_stats(hp, data)
    mc = _mesh_setup(hp)
    if mc is not None:
        enc_params = mc.shard_params(enc_params)
    extractor = make_feature_extractor(
        encoder, enc_params, hp.block_index, mean, std
    )
    if mc is not None:
        _extract = extractor
        extractor = lambda im: _extract(mc.shard_batch(im))  # noqa: E731

    # Feature cache: encoder is frozen → extract once, not once per epoch
    # (the reference recomputes every epoch, LearnerMDN.py:151).
    feats_train = extract_features(extractor, data.train_batches(hp.prefetch))
    feats_valid = extract_features(extractor, data.valid_batches(hp.prefetch))
    embed_dim = feats_train.shape[-1]

    mdn = GaussianMDN(features=embed_dim, num_gaussians=hp.num_gaussians)
    rng, k = jax.random.split(rng)
    head_params = mdn.init(k, jnp.zeros((1, 1, embed_dim)))
    if hp.kmeans_init:
        from vit_ad_tpu.pipeline.cluster_init import (
            kmeans_cluster_centers,
            seed_mdn_mu_bias,
        )

        centers = kmeans_cluster_centers(feats_train, hp.num_gaussians)
        head_params = seed_mdn_mu_bias(head_params, centers)
    if mc is not None:
        # mixture-parallel head placement; tx.init below inherits the
        # shardings via computation-follows-data
        head_params = mc.shard_params(head_params)
    tx = torch_adam(hp.learning_rate, hp.weight_decay)
    opt_state = tx.init(head_params)

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

    eval_loss = jax.jit(lambda p, f, v: masked_loss(p, f, v, None))

    # scan-of-batches epochs: the whole epoch as ONE dispatch over the
    # stacked staged features (same batches, same rng-split sequence as the
    # loop — tests/test_scan_epoch.py locks history parity); falls back to
    # the per-step loop over staged batches when the stack exceeds the
    # device-cache budget or features re-extract per epoch
    train_stack = valid_stack = None
    if use_scan_epochs():
        if hp.cache_frozen_features:
            train_stack = stage_feature_epoch(feats_train, hp.batch_size, mc)
        valid_stack = stage_feature_epoch(feats_valid, hp.batch_size, mc)
    train_batches_dev = (
        None if train_stack is not None
        else stage_feature_batches(feats_train, hp.batch_size, mc)
    )
    valid_batches_dev = (
        None if valid_stack is not None
        else stage_feature_batches(feats_valid, hp.batch_size, mc)
    )

    def _scan_body(carry, xs):
        params, opt_state, r = carry
        feats, valid = xs
        r, k = jax.random.split(r)
        loss, grads = jax.value_and_grad(masked_loss)(params, feats, valid, k)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt_state, r), loss

    train_epoch_scan = make_scan_epoch(_scan_body, n_carry=3)

    valid_epoch_scan = make_valid_scan_epoch(eval_loss)

    def train_epoch(epoch):
        nonlocal rng, head_params, opt_state, train_batches_dev
        if train_stack is not None:
            head_params, opt_state, rng, losses = train_epoch_scan(
                head_params, opt_state, rng,
                train_stack.feats, train_stack.valid,
            )
            return (
                _stacked_weighted_mean(losses, train_stack.weights),
                float(train_stack.weights.sum()),
            )
        if not hp.cache_frozen_features and epoch > 0:
            train_batches_dev = stage_feature_batches(
                extract_features(extractor, data.train_batches(hp.prefetch)),
                hp.batch_size, mc,
            )
        losses, weights = [], []
        for feats, valid, w in train_batches_dev():
            rng, k = jax.random.split(rng)
            head_params, opt_state, loss = train_step(
                head_params, opt_state, feats, valid, k
            )
            losses.append(loss)
            weights.append(w)
        return _weighted_mean(losses, weights), float(np.sum(weights))

    def valid_epoch():
        if valid_stack is not None:
            losses = valid_epoch_scan(
                head_params, valid_stack.feats, valid_stack.valid
            )
            return _stacked_weighted_mean(losses, valid_stack.weights)
        vlosses, vweights = [], []
        for feats, valid, w in valid_batches_dev():
            vlosses.append(eval_loss(head_params, feats, valid))
            vweights.append(w)
        return _weighted_mean(vlosses, vweights)

    history, epochs_ran, stopper = run_epochs(
        hp, train_epoch, valid_epoch, lambda: head_params, logger
    )

    best_params = stopper.best_params if stopper.best_params is not None else head_params

    metrics: Dict[str, float] = {}
    if test_data is not None:
        metrics = evaluate_mdn(
            encoder, enc_params, mdn, best_params, test_data, hp, mean, std,
            figures_dir=figures_dir, logger=logger,
        )
        if logger is not None:
            logger.log({**metrics, "stage": "eval"})

    return TrainResult(
        head_params=best_params,
        encoder_params=enc_params,
        history=history,
        metrics=metrics,
        epochs_ran=epochs_ran,
        best_epoch=stopper.best_epoch,
        best_valid_loss=float(stopper.best_loss) if stopper.best_loss is not None else float("nan"),
        encoder=encoder,
        head=mdn,
    )


def train_nf(
    hp: HyperParams,
    data: DataPipeline,
    test_data: Optional[DataPipeline] = None,
    encoder: Optional[nn.Module] = None,
    enc_params: Any = None,
    logger: Any = None,
    figures_dir: Optional[str] = None,
) -> TrainResult:
    """Train the normalizing-flow head on frozen-encoder features.

    Reference flow: LearnerNF.train_with_transformer (reference
    src/pipeline/LearnerNF.py:91-235) — one NF sized (emb, sqrt(P))^2, Adam on
    NF params only, NLL loss, early stopping, final ValidatorNF metrics.
    One deliberate fix: the reference gates early stopping behind
    enable_wandb (LearnerNF.py:184); here it is always active."""
    from vit_ad_tpu.pipeline.eval import evaluate_nf

    rng = jax.random.key(hp.seed)
    if encoder is None:
        encoder = get_model(hp.model_name, hp.img_size, hp.dtypes)
    if enc_params is None:
        rng, _ = jax.random.split(rng)
        enc_params = default_encoder_params(encoder, hp)

    mean, std = _norm_stats(hp, data)
    mc = _mesh_setup(hp)
    if mc is not None:
        enc_params = mc.shard_params(enc_params)
    extractor = make_feature_extractor(
        encoder, enc_params, hp.block_index, mean, std
    )
    if mc is not None:
        _extract = extractor
        extractor = lambda im: _extract(mc.shard_batch(im))  # noqa: E731
    feats_train = extract_features(extractor, data.train_batches(hp.prefetch))
    feats_valid = extract_features(extractor, data.valid_batches(hp.prefetch))
    n, p, embed_dim = feats_train.shape

    flow = NormalizingFlow(
        num_channels=embed_dim,
        img_size=hp.img_size,
        num_patches=p,
        hidden_ratio=hp.hidden_ratio,
        flow_steps=hp.flow_steps,
        dtypes=hp.dtypes,
    )
    rng, k = jax.random.split(rng)
    side = int(np.sqrt(p))
    head_params = flow.init(k, jnp.zeros((1, side, side, embed_dim)))
    if mc is not None:
        head_params = mc.shard_params(head_params)
    tx = torch_adam(hp.learning_rate, hp.weight_decay)
    opt_state = tx.init(head_params)

    def masked_loss(params, feats, valid):
        fmap = patch_tokens_to_map(feats)
        z, logdet = flow.apply(params, fmap, method=NormalizingFlow.transform)
        per_example = 0.5 * jnp.sum(z * z, axis=(1, 2, 3)) - logdet
        return jnp.sum(per_example * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feats, valid):
        loss, grads = jax.value_and_grad(masked_loss)(params, feats, valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda pp, u: pp + u, params, updates), opt_state, loss

    eval_loss = jax.jit(masked_loss)

    # scan-of-batches epochs (see train_mdn): one dispatch per epoch over
    # the stacked staged features, per-step loop as the fallback
    train_stack = valid_stack = None
    if use_scan_epochs():
        if hp.cache_frozen_features:
            train_stack = stage_feature_epoch(feats_train, hp.batch_size, mc)
        valid_stack = stage_feature_epoch(feats_valid, hp.batch_size, mc)
    train_batches_dev = (
        None if train_stack is not None
        else stage_feature_batches(feats_train, hp.batch_size, mc)
    )
    valid_batches_dev = (
        None if valid_stack is not None
        else stage_feature_batches(feats_valid, hp.batch_size, mc)
    )

    def _scan_body(carry, xs):
        params, opt_state = carry
        feats, valid = xs
        loss, grads = jax.value_and_grad(masked_loss)(params, feats, valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda pp, u: pp + u, params, updates)
        return (params, opt_state), loss

    train_epoch_scan = make_scan_epoch(_scan_body, n_carry=2)

    valid_epoch_scan = make_valid_scan_epoch(eval_loss)

    def train_epoch(epoch):
        nonlocal head_params, opt_state, train_batches_dev
        if train_stack is not None:
            head_params, opt_state, losses = train_epoch_scan(
                head_params, opt_state, train_stack.feats, train_stack.valid
            )
            return (
                _stacked_weighted_mean(losses, train_stack.weights),
                float(train_stack.weights.sum()),
            )
        if not hp.cache_frozen_features and epoch > 0:
            train_batches_dev = stage_feature_batches(
                extract_features(extractor, data.train_batches(hp.prefetch)),
                hp.batch_size, mc,
            )
        losses, weights = [], []
        for feats, valid, w in train_batches_dev():
            head_params, opt_state, loss = train_step(
                head_params, opt_state, feats, valid
            )
            losses.append(loss)
            weights.append(w)
        return _weighted_mean(losses, weights), float(np.sum(weights))

    def valid_epoch():
        if valid_stack is not None:
            losses = valid_epoch_scan(
                head_params, valid_stack.feats, valid_stack.valid
            )
            return _stacked_weighted_mean(losses, valid_stack.weights)
        vlosses, vweights = [], []
        for feats, valid, w in valid_batches_dev():
            vlosses.append(eval_loss(head_params, feats, valid))
            vweights.append(w)
        return _weighted_mean(vlosses, vweights)

    history, epochs_ran, stopper = run_epochs(
        hp, train_epoch, valid_epoch, lambda: head_params, logger
    )

    best_params = stopper.best_params if stopper.best_params is not None else head_params

    metrics: Dict[str, float] = {}
    if test_data is not None:
        metrics = evaluate_nf(
            encoder, enc_params, flow, best_params, test_data, hp, mean, std,
            figures_dir=figures_dir, logger=logger,
        )
        if logger is not None:
            logger.log({**metrics, "stage": "eval"})

    return TrainResult(
        head_params=best_params,
        encoder_params=enc_params,
        history=history,
        metrics=metrics,
        epochs_ran=epochs_ran,
        best_epoch=stopper.best_epoch,
        best_valid_loss=float(stopper.best_loss) if stopper.best_loss is not None else float("nan"),
        encoder=encoder,
        head=flow,
    )


def _freeze_mask(params, trainable_top_keys):
    """optax.multi_transform label tree: 'train' for subtrees under the given
    top-level keys, 'freeze' elsewhere — the JAX equivalent of the
    reference's requires_grad=False encoder freezing."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    labels = {
        k: ("train" if k[1] in trainable_top_keys or not trainable_top_keys else "freeze")
        for k in flat
    }
    return flax.traverse_util.unflatten_dict(labels)


def train_recon(
    hp: HyperParams,
    data: DataPipeline,
    test_data: Optional[DataPipeline] = None,
    model: Optional[nn.Module] = None,
    use_ssim: bool = False,
    logger: Any = None,
    figures_dir: Optional[str] = None,
) -> TrainResult:
    """Train a reconstruction auto-encoder.

    Reference flow: LearnerRecon.learn_ae_with_MSE_only (reference
    src/pipeline/LearnerRecon.py:390-502): Adam over trainable params, MSE
    loss between reconstruction and (normalized) input, early stopping,
    final ValidatorRecon metrics. use_ssim=True reproduces learn_ae_with_SSIM
    (:278-388): loss = mse_weight*MSE + ssim_weight*(1-SSIM)."""
    import optax

    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.ops.ssim import ssim_per_image
    from vit_ad_tpu.pipeline.eval import evaluate_recon

    rng = jax.random.key(hp.seed)
    if model is None:
        model = get_model(hp.model_name, hp.img_size, hp.dtypes)

    mean, std = _norm_stats(hp, data)
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

    rng, k = jax.random.split(rng)
    variables = model.init(
        k, jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32), train=True
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    mc = _mesh_setup(hp)
    if mc is not None:
        # CNN decoders/AEs match no TP rule → params replicate; the win here
        # is pure DP (batch over "data"), incl. cross-device BN stats via
        # GSPMD's all-reduce on the batch mean
        params = mc.shard_params(params)
        batch_stats = mc.replicate(batch_stats)

    # Vanilla CNN AE trains end-to-end; pretrained-encoder AEs train the
    # decoder only (reference freezes encoder weights via requires_grad).
    from vit_ad_tpu.models.autoencoder import (
        TransformerAutoEncoder,
        VanillaAutoEncoder,
    )

    trainable = () if isinstance(model, VanillaAutoEncoder) else ("decoder",)

    # Latent cache: for frozen transformer encoders the AE latent is a pure
    # function of the (fixed) input — compute it once and train the decoder
    # alone, skipping the encoder forward every step.
    use_latent_cache = (
        hp.cache_frozen_features and isinstance(model, TransformerAutoEncoder)
    )
    base_tx = torch_adam(hp.learning_rate, hp.weight_decay)
    if trainable:
        labels = _freeze_mask({"params": params}, trainable)["params"]
        tx = optax.multi_transform(
            {"train": base_tx, "freeze": optax.set_to_zero()}, labels
        )
    else:
        tx = base_tx
    opt_state = tx.init(params)

    def _decode(params, batch_stats, z):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            z, train=True, mutable=["batch_stats"],
            method=lambda m, zz, train: m.decoder(zz, train=train),
        )

    def loss_fn(params, batch_stats, images_u8, valid, latents=None):
        x = preprocess(images_u8, mean_j, std_j)
        if latents is not None:
            recon, updates = _decode(params, batch_stats, latents)
        else:
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            recon = out.reconstruction
        recon = recon.astype(jnp.float32)
        err = jnp.mean(
            jnp.square(recon - x.astype(jnp.float32)), axis=(1, 2, 3)
        )
        loss = jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        if use_ssim:
            # per-image SSIM, masked-mean over the real rows only: the final
            # batch is padded to the static size by duplicating rows, and an
            # unmasked batch mean would bias the objective toward those
            s = ssim_per_image(recon, x.astype(jnp.float32), data_range=1.0)
            s_mean = jnp.sum(s * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            loss = hp.mse_weight * loss + hp.ssim_weight * (1.0 - s_mean)
        return loss, updates["batch_stats"]

    # donated like every other trainer's step (and this trainer's own scan
    # path): the loop fallback runs exactly when the staged epoch exceeds
    # the device cache — the configurations least able to afford live
    # old+new copies of params + Adam state + batch_stats
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, images_u8, valid):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images_u8, valid
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            jax.tree.map(lambda p, u: p + u, params, updates),
            new_stats,
            opt_state,
            loss,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step_cached(params, batch_stats, opt_state, images_u8, valid, latents):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images_u8, valid, latents
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            jax.tree.map(lambda p, u: p + u, params, updates),
            new_stats,
            opt_state,
            loss,
        )

    # scan-of-batches epochs (see train_mdn) over the decoded-once epoch
    # batches; features.image_epoch_staging picks stack vs per-batch device
    # staging vs the lazy decode-every-epoch fallback
    train_stack, train_batches_dev = image_epoch_staging(
        lambda: data.train_batches(hp.prefetch), mc
    )
    valid_stack, valid_batches_dev = image_epoch_staging(
        lambda: data.valid_batches(hp.prefetch), mc
    )

    latents_stack = None  # scan path: [S, B, ...] device latents
    latents_dev = None   # staged: per-batch device latents, aligned 1:1
    latents_train = None  # lazy fallback: host [N, ...] array, offset-sliced
    valid_latents_stack = None  # valid-set latents are equally frozen
    valid_latents_dev = None
    if use_latent_cache:
        @jax.jit
        def _latent(params, batch_stats, images_u8):
            x = preprocess(images_u8, mean_j, std_j)
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=False,
            ).latent

        _latent_stack = jax.jit(
            lambda p, bs, ims: jax.lax.map(lambda im: _latent(p, bs, im), ims)
        )
        if train_stack is not None:
            # latents of padded rows equal the duplicated last valid row's
            # latent — identical to the host path's np.repeat padding
            latents_stack = _latent_stack(params, batch_stats, train_stack.feats)
        elif train_batches_dev.staged:
            latents_dev = [
                _latent(params, batch_stats, im)
                for im, _, _ in train_batches_dev()
            ]
        else:
            chunks = []
            for im, _, w in train_batches_dev():
                z = _latent(params, batch_stats, im)
                chunks.append(np.asarray(z[: int(w)]))
            latents_train = np.concatenate(chunks, 0)
        # the frozen encoder makes VALID latents a run constant too — cache
        # them so every validation epoch is decoder-only (identical values:
        # transformer encoders carry no mutable state, train=False forward)
        if valid_stack is not None:
            valid_latents_stack = _latent_stack(
                params, batch_stats, valid_stack.feats
            )
        elif valid_batches_dev.staged:
            valid_latents_dev = [
                _latent(params, batch_stats, im)
                for im, _, _ in valid_batches_dev()
            ]

    def _scan_body(carry, xs):
        params, batch_stats, opt_state = carry
        images, valid, latents = xs
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, images, valid, latents)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, new_stats, opt_state), loss

    train_epoch_scan = make_scan_epoch(_scan_body, n_carry=3)

    @jax.jit
    def valid_epoch_scan(params, batch_stats, images_s, valid_s, latents_s):
        def body(carry, xs):
            images, valid, latents = xs
            if latents is not None:
                loss = valid_loss_cached(
                    params, batch_stats, images, valid, latents
                )
            else:
                loss = valid_loss_fn(params, batch_stats, images, valid)
            return carry, loss
        _, losses = jax.lax.scan(body, 0, (images_s, valid_s, latents_s))
        return losses

    @jax.jit
    def valid_loss_fn(params, batch_stats, images_u8, valid):
        x = preprocess(images_u8, mean_j, std_j)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        err = jnp.mean(
            jnp.square(out.reconstruction.astype(jnp.float32) - x.astype(jnp.float32)),
            axis=(1, 2, 3),
        )
        return jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    @jax.jit
    def valid_loss_cached(params, batch_stats, images_u8, valid, latents):
        """valid_loss_fn with the frozen encoder's latent precomputed —
        decoder-only eval forward, bit-identical values."""
        x = preprocess(images_u8, mean_j, std_j)
        recon = model.apply(
            {"params": params, "batch_stats": batch_stats},
            latents, train=False,
            method=lambda m, zz, train: m.decoder(zz, train=train),
        )
        err = jnp.mean(
            jnp.square(recon.astype(jnp.float32) - x.astype(jnp.float32)),
            axis=(1, 2, 3),
        )
        return jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def train_epoch(epoch):
        nonlocal params, batch_stats, opt_state
        if train_stack is not None:
            params, batch_stats, opt_state, losses = train_epoch_scan(
                params, batch_stats, opt_state,
                train_stack.feats, train_stack.valid, latents_stack,
            )
            return (
                _stacked_weighted_mean(losses, train_stack.weights),
                float(train_stack.weights.sum()),
            )
        losses, weights = [], []
        offset = 0
        for bi, (images, valid, w) in enumerate(train_batches_dev()):
            if latents_dev is not None:
                params, batch_stats, opt_state, loss = train_step_cached(
                    params, batch_stats, opt_state, images, valid,
                    latents_dev[bi],
                )
            elif latents_train is not None:
                n_valid = int(w)
                z = latents_train[offset : offset + n_valid]
                offset += n_valid
                if n_valid < images.shape[0]:
                    z = np.concatenate(
                        [z, np.repeat(z[-1:], images.shape[0] - n_valid, 0)]
                    )
                params, batch_stats, opt_state, loss = train_step_cached(
                    params, batch_stats, opt_state, images, valid,
                    _shard(mc, jnp.asarray(z)),
                )
            else:
                params, batch_stats, opt_state, loss = train_step(
                    params, batch_stats, opt_state, images, valid
                )
            losses.append(loss)
            weights.append(w)
        return _weighted_mean(losses, weights), float(np.sum(weights))

    def valid_epoch():
        if valid_stack is not None:
            losses = valid_epoch_scan(
                params, batch_stats, valid_stack.feats, valid_stack.valid,
                valid_latents_stack,
            )
            return _stacked_weighted_mean(losses, valid_stack.weights)
        vlosses, vweights = [], []
        for bi, (images, valid, w) in enumerate(valid_batches_dev()):
            if valid_latents_dev is not None:
                vlosses.append(valid_loss_cached(
                    params, batch_stats, images, valid, valid_latents_dev[bi]
                ))
            else:
                vlosses.append(
                    valid_loss_fn(params, batch_stats, images, valid)
                )
            vweights.append(w)
        return _weighted_mean(vlosses, vweights)

    history, epochs_ran, stopper = run_epochs(
        hp, train_epoch, valid_epoch,
        lambda: {"params": params, "batch_stats": batch_stats}, logger,
    )

    best = (
        stopper.best_params
        if stopper.best_params is not None
        else {"params": params, "batch_stats": batch_stats}
    )

    metrics: Dict[str, float] = {}
    if test_data is not None:
        metrics = evaluate_recon(model, best, test_data, hp, mean, std,
                                 figures_dir=figures_dir, logger=logger)
        if logger is not None:
            logger.log({**metrics, "stage": "eval"})

    return TrainResult(
        head_params=best,
        encoder_params=None,
        history=history,
        metrics=metrics,
        epochs_ran=epochs_ran,
        best_epoch=stopper.best_epoch,
        best_valid_loss=float(stopper.best_loss) if stopper.best_loss is not None else float("nan"),
        encoder=None,
        head=model,
    )


def _resnet_trainable_mask(params):
    """Label tree freezing the ResNet trunk: only the FastFlow stage
    LayerNorms train inside the encoder (reference LearnerMDN.py:290-294 puts
    encoder params in the optimizer, but every trunk weight has
    requires_grad=False — the stage norms are the only live ones)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    labels = {
        k: ("freeze" if "trunk" in k else "train") for k in flat
    }
    return flax.traverse_util.unflatten_dict(labels)


def train_mdn_resnet(
    hp: HyperParams,
    data: DataPipeline,
    test_data: Optional[DataPipeline] = None,
    encoder: Optional[nn.Module] = None,
    enc_variables: Any = None,
    logger: Any = None,
    figures_dir: Optional[str] = None,
) -> TrainResult:
    """MDN over ResNet stages 2-3: two GMDNs, one per stage map, summed NLL
    (reference LearnerMDN.learn_mdn_resnet, src/pipeline/LearnerMDN.py:242-419;
    stage range hardcoded 2..3 at :268-279)."""
    import optax

    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.models.resnet import STAGE_CHANNELS, ResNetEncoder
    from vit_ad_tpu.pipeline.eval import evaluate_mdn_resnet

    stages = (2, 3)
    rng = jax.random.key(hp.seed)
    if encoder is None:
        encoder = ResNetEncoder(img_size=hp.img_size, dtypes=hp.dtypes)
    if enc_variables is None:
        rng, k = jax.random.split(rng)
        enc_variables = encoder.init(
            k, jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32)
        )
    mean, std = _norm_stats(hp, data)
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

    mdns = [
        GaussianMDN(features=STAGE_CHANNELS[i], num_gaussians=hp.num_gaussians)
        for i in stages
    ]
    head_params = []
    for i, mdn in zip(stages, mdns):
        rng, k = jax.random.split(rng)
        head_params.append(mdn.init(k, jnp.zeros((1, 1, STAGE_CHANNELS[i]))))

    # joint params: heads + encoder (trunk frozen via mask)
    params = {"heads": head_params, "encoder": enc_variables["params"]}
    enc_stats = {"batch_stats": enc_variables.get("batch_stats", {})}
    mc = _mesh_setup(hp)
    from vit_ad_tpu.pipeline.mdn_chunked import chunked_heads_mode

    kc = chunked_heads_mode(hp, stages, mc)
    if kc is not None:
        # single-chip capacity path: the joint step's params+moments+grads
        # exceed the accelerator budget (measured 16.83 GB at the
        # reference's headline K=100 vs 15.75 GB v5e HBM) — fuse the Adam
        # update into a K-chunked backward so full-size head gradients
        # never materialize (pipeline/mdn_chunked.py)
        return _train_mdn_resnet_chunked(
            hp, data, test_data, encoder, enc_variables, logger,
            figures_dir, stages, mdns, head_params, mean, std, kc, rng,
        )
    if mc is not None:
        # heads shard mixture-parallel (w_mu/w_sigma K-axis over "model" —
        # the [D,D,K] tensors are the HBM hogs here); trunk replicates
        params = mc.shard_params(params)
        enc_stats = mc.replicate(enc_stats)
    base_tx = torch_adam(hp.learning_rate, hp.weight_decay)
    labels = {
        "heads": jax.tree.map(lambda _: "train", head_params),
        "encoder": _resnet_trainable_mask(params["encoder"]),
    }
    tx = optax.multi_transform(
        {"train": base_tx, "freeze": optax.set_to_zero()}, labels
    )
    opt_state = tx.init(params)

    def stage_inputs(enc_params, images_u8):
        x = preprocess(images_u8, mean_j, std_j)
        maps = encoder.apply(
            {"params": enc_params, **enc_stats}, x, train=False,
            method=ResNetEncoder.stage_features,
        )
        out = []
        for i in stages:
            m = maps[i]
            b, h, w, c = m.shape
            out.append(m.reshape(b, h * w, c))
        return out

    def loss_fn(params, images_u8, valid, step_rng):
        # the conv trunk is frozen (reference: requires_grad=False on every
        # res_net weight) — stop_gradient keeps XLA from building the trunk
        # backward and materializing its grad buffers; only the FastFlow
        # stage norms differentiate inside the encoder
        enc_p = dict(params["encoder"])
        enc_p["trunk"] = jax.lax.stop_gradient(enc_p["trunk"])
        inputs = stage_inputs(enc_p, images_u8)
        total = 0.0
        # step_rng=None → deterministic mixture weights (softmax, no gumbel)
        # — the validation/early-stopping objective, matching train_mdn's
        # eval_loss and the test-time scorer (gumbel-train/deterministic-
        # eval policy)
        rngs = (
            jax.random.split(step_rng, len(inputs))
            if step_rng is not None else [None] * len(inputs)
        )
        for feats, hp_, mdn, r in zip(inputs, params["heads"], mdns, rngs):
            ll = mdn.apply(hp_, feats, rng=r, method=GaussianMDN.log_likelihood)
            per_example = -jnp.mean(ll, axis=(1, 2))
            total = total + jnp.sum(per_example * valid) / jnp.maximum(
                jnp.sum(valid), 1.0
            )
        return total

    # donation is ESSENTIAL here: the two mixture heads carry [D, D, K]
    # weight tensors (~3.4 GB params + ~6.7 GB Adam state at K=50), and
    # without donated buffers the updated copies double the footprint —
    # measured RESOURCE_EXHAUSTED on the 16 GB v5e at batch 8
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, images_u8, valid, step_rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, images_u8, valid, step_rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    eval_loss = jax.jit(lambda p, im, v: loss_fn(p, im, v, None))

    # scan-of-batches epochs (see train_mdn): one dispatch per epoch over
    # the stacked staged uint8 batches; features.image_epoch_staging picks
    # stack vs per-batch staging vs lazy fallback
    train_stack, train_batches_dev = image_epoch_staging(
        lambda: data.train_batches(hp.prefetch), mc
    )
    valid_stack, valid_batches_dev = image_epoch_staging(
        lambda: data.valid_batches(hp.prefetch), mc
    )

    def _scan_body(carry, xs):
        params, opt_state, r = carry
        images, valid = xs
        r, k = jax.random.split(r)
        loss, grads = jax.value_and_grad(loss_fn)(params, images, valid, k)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt_state, r), loss

    train_epoch_scan = make_scan_epoch(_scan_body, n_carry=3)

    valid_epoch_scan = make_valid_scan_epoch(eval_loss)

    def train_epoch(epoch):
        nonlocal rng, params, opt_state
        if train_stack is not None:
            params, opt_state, rng, losses = train_epoch_scan(
                params, opt_state, rng,
                train_stack.feats, train_stack.valid,
            )
            return (
                _stacked_weighted_mean(losses, train_stack.weights),
                float(train_stack.weights.sum()),
            )
        losses, weights = [], []
        for images, valid, w in train_batches_dev():
            rng, k = jax.random.split(rng)
            params, opt_state, loss = train_step(
                params, opt_state, images, valid, k
            )
            losses.append(loss)
            weights.append(w)
        return _weighted_mean(losses, weights), float(np.sum(weights))

    def valid_epoch():
        if valid_stack is not None:
            losses = valid_epoch_scan(
                params, valid_stack.feats, valid_stack.valid
            )
            return _stacked_weighted_mean(losses, valid_stack.weights)
        vlosses, vweights = [], []
        for images, valid, w in valid_batches_dev():
            vlosses.append(eval_loss(params, images, valid))
            vweights.append(w)
        return _weighted_mean(vlosses, vweights)

    # the snapshot (→ best_params checkpoint) carries the trunk's BN
    # running stats too: they are frozen during training, but a caller-
    # supplied pretrained encoder (enc_variables) has REAL ImageNet stats —
    # without them in the checkpoint, run-dir restore would silently
    # rebuild with fresh zeros/ones stats and score differently
    def _snapshot():
        return {**params, "enc_batch_stats": enc_stats["batch_stats"]}

    history, epochs_ran, stopper = run_epochs(
        hp, train_epoch, valid_epoch, _snapshot, logger
    )

    best = (
        stopper.best_params if stopper.best_params is not None
        else _snapshot()
    )

    metrics: Dict[str, float] = {}
    if test_data is not None:
        metrics = evaluate_mdn_resnet(
            encoder,
            {"params": best["encoder"], **enc_stats},
            mdns,
            best["heads"],
            test_data, hp, mean, std, stages=stages,
            figures_dir=figures_dir, logger=logger,
        )
        if logger is not None:
            logger.log({**metrics, "block_index": str(list(stages)), "stage": "eval"})

    return TrainResult(
        head_params=best,
        # NOT enc_variables: its param buffers were donated by train_step;
        # the best-snapshot copy (+ unchanged batch_stats) is the live one
        encoder_params={"params": best["encoder"], **enc_stats},
        history=history,
        metrics=metrics,
        epochs_ran=epochs_ran,
        best_epoch=stopper.best_epoch,
        best_valid_loss=float(stopper.best_loss) if stopper.best_loss is not None else float("nan"),
        encoder=encoder,
        head=None,
    )


def _train_mdn_resnet_chunked(
    hp: HyperParams,
    data: DataPipeline,
    test_data: Optional[DataPipeline],
    encoder: nn.Module,
    enc_variables: Any,
    logger: Any,
    figures_dir: Optional[str],
    stages,
    mdns,
    head_params,
    mean,
    std,
    k_chunk: int,
    rng,
) -> TrainResult:
    """train_mdn_resnet's single-chip capacity path for big K (reference
    headline K=100, startTraining_mdn.py:26-38 / csv_results_gmm): per-batch
    steps whose head backward is K-chunked with the torch-Adam update fused
    into the chunk loop (pipeline/mdn_chunked.py) — peak HBM drops from 4x
    to ~3x the head state, fitting K=100 on one v5e. Loss math, gumbel rng
    stream, stage-norm training, early stopping, and eval are identical to
    the joint path (gradient-equivalence locked by tests/test_mdn_chunked)."""
    import optax

    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.models.resnet import ResNetEncoder
    from vit_ad_tpu.pipeline import mdn_chunked as MC
    from vit_ad_tpu.pipeline.eval import evaluate_mdn_resnet

    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)
    enc_params = enc_variables["params"]
    enc_stats = {"batch_stats": enc_variables.get("batch_stats", {})}
    heads = [dict(h["params"]) for h in head_params]
    # sublane-aligned plan (OPT-IN: VITAD_MDN_KCHUNK=pad, or =force in
    # tests): pad K once to a multiple of 8 and chunk at 8 — the GMM
    # kernels pad each chunk's K to a sublane multiple anyway, so kc=10
    # runs 16 components' worth of K-work (~37% waste). MEASURED at K=100
    # B=32 on the v5e: the +4% padded standing state (params+m+v
    # 12.6→13.1 GB) costs more than the chunk savings and the step OOMs
    # even after the online-LSE and zero-copy-snapshot fixes — so auto
    # mode does NOT pad; the lever stands for chips with more HBM
    # headroom. Pad components are exactly inert (masked update, real-K
    # gumbel stream; mdn_chunked.padded_plan) and snapshots/checkpoints/
    # eval see the real-K slices.
    k_real = hp.num_gaussians
    _env = os.environ.get("VITAD_MDN_KCHUNK", "auto").strip()
    if _env in ("pad", "force"):
        k_pad, k_chunk, k_mask = MC.padded_plan(k_real)
        if k_mask is not None:
            heads = [MC.pad_head_k(h, k_pad) for h in heads]
    else:
        k_pad, k_mask = k_real, None
    _opts = [MC.init_head_opt(h) for h in heads]
    opt_m = [o["m"] for o in _opts]
    opt_v = [o["v"] for o in _opts]
    ll_fns = [MC.make_chunk_ll_fn(mdn.features) for mdn in mdns]
    # direct chunk backward (OPT-IN, VITAD_MDN_CHUNK_BWD=direct): phase B
    # consumes phase A's ll_total instead of re-running every chunk's
    # forward inside jax.vjp — gradient-identical
    # (mdn_chunked.make_chunk_bwd_fn). MEASURED at K=100 (hw_queue29):
    # B=32 1.577 s/epoch vs 1.604 vjp (−1.7% — the duplicated forward is
    # a minor term next to per-chunk dispatch + Adam slicing) but B=64
    # RESOURCE_EXHAUSTED where the vjp path runs 2.40 s/epoch — a capacity
    # regression on the path that exists for capacity. Default stays vjp.
    if os.environ.get("VITAD_MDN_CHUNK_BWD", "vjp") == "direct":
        bwd_fns = [MC.make_chunk_bwd_fn(mdn.features) for mdn in mdns]
    else:
        bwd_fns = [None for _ in mdns]
    mdns_eval = mdns if k_mask is None else [
        GaussianMDN(features=mdn.features, num_gaussians=k_pad,
                    dtypes=mdn.dtypes, k_chunk=mdn.k_chunk)
        for mdn in mdns
    ]

    tx_enc = optax.multi_transform(
        {"train": torch_adam(hp.learning_rate, hp.weight_decay),
         "freeze": optax.set_to_zero()},
        _resnet_trainable_mask(enc_params),
    )
    enc_opt = tx_enc.init(enc_params)

    def stage_inputs(enc_p, images_u8):
        x = preprocess(images_u8, mean_j, std_j)
        maps = encoder.apply(
            {"params": enc_p, **enc_stats}, x, train=False,
            method=ResNetEncoder.stage_features,
        )
        out = []
        for i in stages:
            m = maps[i]
            b, h, w, c = m.shape
            out.append(m.reshape(b, h * w, c))
        return tuple(out)

    def feats_fn(enc_p, images_u8):
        enc_p = dict(enc_p)
        enc_p["trunk"] = jax.lax.stop_gradient(enc_p["trunk"])
        return stage_inputs(enc_p, images_u8)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(hstate, enc_state, images_u8, valid, step_rng):
        heads, opt_m, opt_v, count = hstate
        enc_p, enc_opt_s = enc_state
        inputs, trunk_vjp = jax.vjp(lambda ep: feats_fn(ep, images_u8), enc_p)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        rngs = jax.random.split(step_rng, len(inputs))
        t = count + 1
        new_heads, new_m, new_v, dxs = [], [], [], []
        loss = 0.0
        for i, (x_s, ll_fn) in enumerate(zip(inputs, ll_fns)):
            _, p_, d_ = x_s.shape
            ct = jnp.broadcast_to(
                (-valid / (p_ * d_ * denom))[:, None, None], x_s.shape
            )
            h_n, m_n, v_n, dx, ll_tot = MC.chunked_head_update(
                x_s, rngs[i], heads[i], opt_m[i], opt_v[i], t, ct,
                hp.learning_rate, hp.weight_decay, k_chunk, ll_fn,
                mask=k_mask, k_real=k_real if k_mask is not None else None,
                bwd_fn=bwd_fns[i],
            )
            per_example = -jnp.mean(ll_tot, axis=(1, 2))
            loss = loss + jnp.sum(per_example * valid) / denom
            new_heads.append(h_n)
            new_m.append(m_n)
            new_v.append(v_n)
            # head math runs f32; the trunk vjp's cotangent must match the
            # stage features' compute dtype (bf16 under the default policy)
            dxs.append(dx.astype(x_s.dtype))
        (enc_grads,) = trunk_vjp(tuple(dxs))
        enc_updates, enc_opt_s = tx_enc.update(enc_grads, enc_opt_s, enc_p)
        enc_p = jax.tree.map(lambda p, u: p + u, enc_p, enc_updates)
        return (new_heads, new_m, new_v, t), (enc_p, enc_opt_s), loss

    def eval_loss_fn(heads, enc_p, images_u8, valid):
        inputs = stage_inputs(enc_p, images_u8)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        total = 0.0
        for x_s, h, mdn in zip(inputs, heads, mdns_eval):
            ll = mdn.apply(
                {"params": h}, x_s, rng=None,
                method=GaussianMDN.log_likelihood,
            )
            per_example = -jnp.mean(ll, axis=(1, 2))
            total = total + jnp.sum(per_example * valid) / denom
        return total

    eval_loss = jax.jit(eval_loss_fn)

    train_stack, train_batches_dev = image_epoch_staging(
        lambda: data.train_batches(hp.prefetch), None
    )
    valid_stack, valid_batches_dev = image_epoch_staging(
        lambda: data.valid_batches(hp.prefetch), None
    )

    def _iter(stack, batches_dev):
        if stack is not None:
            for i in range(stack.feats.shape[0]):
                yield stack.feats[i], stack.valid[i], float(stack.weights[i])
        else:
            yield from batches_dev()

    hstate = (heads, opt_m, opt_v, jnp.zeros((), jnp.int32))
    enc_state = (enc_params, enc_opt)

    def train_epoch(epoch):
        nonlocal rng, hstate, enc_state
        losses, weights = [], []
        for images, valid, w in _iter(train_stack, train_batches_dev):
            rng, k = jax.random.split(rng)
            hstate, enc_state, loss = train_step(
                hstate, enc_state, images, valid, k
            )
            losses.append(loss)
            weights.append(w)
        return _weighted_mean(losses, weights), float(np.sum(weights))

    def valid_epoch():
        vlosses, vweights = [], []
        for images, valid, w in _iter(valid_stack, valid_batches_dev):
            vlosses.append(eval_loss(hstate[0], enc_state[0], images, valid))
            vweights.append(w)
        return _weighted_mean(vlosses, vweights)

    def _snapshot():
        # zero-copy: LIVE (possibly padded) arrays — retention copies them;
        # the real-K unpad happens ONCE post-training (an eager per-epoch
        # device unpad transiently doubled the head params and OOM'd K=100)
        return {
            "heads": [{"params": h} for h in hstate[0]],
            "encoder": enc_state[0],
            "enc_batch_stats": enc_stats["batch_stats"],
        }

    history, epochs_ran, stopper = run_epochs(
        hp, train_epoch, valid_epoch, _snapshot, logger
    )
    best = (
        stopper.best_params if stopper.best_params is not None else _snapshot()
    )
    if k_mask is not None:  # checkpoints/eval carry the REAL K only
        best = dict(best)
        best["heads"] = [
            {"params": MC.unpad_head_k(h["params"], k_real)}
            for h in best["heads"]
        ]

    metrics: Dict[str, float] = {}
    if test_data is not None:
        metrics = evaluate_mdn_resnet(
            encoder,
            {"params": best["encoder"], **enc_stats},
            mdns,
            best["heads"],
            test_data, hp, mean, std, stages=stages,
            figures_dir=figures_dir, logger=logger,
        )
        if logger is not None:
            logger.log({**metrics, "block_index": str(list(stages)),
                        "stage": "eval"})

    return TrainResult(
        head_params=best,
        encoder_params={"params": best["encoder"], **enc_stats},
        history=history,
        metrics=metrics,
        epochs_ran=epochs_ran,
        best_epoch=stopper.best_epoch,
        best_valid_loss=float(stopper.best_loss) if stopper.best_loss is not None else float("nan"),
        encoder=encoder,
        head=None,
    )


def train_nf_resnet(
    hp: HyperParams,
    data: DataPipeline,
    test_data: Optional[DataPipeline] = None,
    encoder: Optional[nn.Module] = None,
    enc_variables: Any = None,
    logger: Any = None,
    figures_dir: Optional[str] = None,
) -> TrainResult:
    """NF over ResNet stages 1-3: three flows, one per stage map, summed NLL
    (reference LearnerNF.train_with_resnet, src/pipeline/LearnerNF.py:237-381;
    stage range 0..2 of in_channels at :252-267)."""
    import optax

    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.models.resnet import STAGE_CHANNELS, STAGE_SCALES, ResNetEncoder
    from vit_ad_tpu.pipeline.eval import evaluate_nf_resnet

    stages = (0, 1, 2)
    rng = jax.random.key(hp.seed)
    if encoder is None:
        encoder = ResNetEncoder(img_size=hp.img_size, dtypes=hp.dtypes)
    if enc_variables is None:
        rng, k = jax.random.split(rng)
        enc_variables = encoder.init(
            k, jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32)
        )
    mean, std = _norm_stats(hp, data)
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

    flows = []
    head_params = []
    for i in stages:
        side = hp.img_size // STAGE_SCALES[i]
        flow = NormalizingFlow(
            num_channels=STAGE_CHANNELS[i],
            img_size=hp.img_size,
            num_patches=side * side,
            hidden_ratio=hp.hidden_ratio,
            flow_steps=hp.flow_steps,
            dtypes=hp.dtypes,
        )
        flows.append(flow)
        rng, k = jax.random.split(rng)
        head_params.append(
            flow.init(k, jnp.zeros((1, side, side, STAGE_CHANNELS[i])))
        )

    params = {"heads": head_params, "encoder": enc_variables["params"]}
    enc_stats = {"batch_stats": enc_variables.get("batch_stats", {})}
    mc = _mesh_setup(hp)
    if mc is not None:
        params = mc.shard_params(params)
        enc_stats = mc.replicate(enc_stats)
    base_tx = torch_adam(hp.learning_rate, hp.weight_decay)
    labels = {
        "heads": jax.tree.map(lambda _: "train", head_params),
        "encoder": _resnet_trainable_mask(params["encoder"]),
    }
    tx = optax.multi_transform(
        {"train": base_tx, "freeze": optax.set_to_zero()}, labels
    )
    opt_state = tx.init(params)

    def loss_fn(params, images_u8, valid):
        # frozen conv trunk: no trunk backward (see train_mdn_resnet)
        enc_p = dict(params["encoder"])
        enc_p["trunk"] = jax.lax.stop_gradient(enc_p["trunk"])
        x = preprocess(images_u8, mean_j, std_j)
        maps = encoder.apply(
            {"params": enc_p, **enc_stats}, x, train=False,
            method=ResNetEncoder.stage_features,
        )
        total = 0.0
        for i, flow, hp_ in zip(stages, flows, params["heads"]):
            z, logdet = flow.apply(
                hp_, maps[i], method=NormalizingFlow.transform
            )
            per_example = 0.5 * jnp.sum(z * z, axis=(1, 2, 3)) - logdet
            total = total + jnp.sum(per_example * valid) / jnp.maximum(
                jnp.sum(valid), 1.0
            )
        return total

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, images_u8, valid):
        loss, grads = jax.value_and_grad(loss_fn)(params, images_u8, valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    eval_loss = jax.jit(loss_fn)

    # scan-of-batches epochs (see train_mdn): one dispatch per epoch over
    # the stacked staged uint8 batches; features.image_epoch_staging picks
    # stack vs per-batch staging vs lazy fallback
    train_stack, train_batches_dev = image_epoch_staging(
        lambda: data.train_batches(hp.prefetch), mc
    )
    valid_stack, valid_batches_dev = image_epoch_staging(
        lambda: data.valid_batches(hp.prefetch), mc
    )

    def _scan_body(carry, xs):
        params, opt_state = carry
        images, valid = xs
        loss, grads = jax.value_and_grad(loss_fn)(params, images, valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt_state), loss

    train_epoch_scan = make_scan_epoch(_scan_body, n_carry=2)

    valid_epoch_scan = make_valid_scan_epoch(eval_loss)

    def train_epoch(epoch):
        nonlocal params, opt_state
        if train_stack is not None:
            params, opt_state, losses = train_epoch_scan(
                params, opt_state, train_stack.feats, train_stack.valid
            )
            return (
                _stacked_weighted_mean(losses, train_stack.weights),
                float(train_stack.weights.sum()),
            )
        losses, weights = [], []
        for images, valid, w in train_batches_dev():
            params, opt_state, loss = train_step(
                params, opt_state, images, valid
            )
            losses.append(loss)
            weights.append(w)
        return _weighted_mean(losses, weights), float(np.sum(weights))

    def valid_epoch():
        if valid_stack is not None:
            losses = valid_epoch_scan(
                params, valid_stack.feats, valid_stack.valid
            )
            return _stacked_weighted_mean(losses, valid_stack.weights)
        vlosses, vweights = [], []
        for images, valid, w in valid_batches_dev():
            vlosses.append(eval_loss(params, images, valid))
            vweights.append(w)
        return _weighted_mean(vlosses, vweights)

    # the snapshot (→ best_params checkpoint) carries the trunk's BN
    # running stats too: they are frozen during training, but a caller-
    # supplied pretrained encoder (enc_variables) has REAL ImageNet stats —
    # without them in the checkpoint, run-dir restore would silently
    # rebuild with fresh zeros/ones stats and score differently
    def _snapshot():
        return {**params, "enc_batch_stats": enc_stats["batch_stats"]}

    history, epochs_ran, stopper = run_epochs(
        hp, train_epoch, valid_epoch, _snapshot, logger
    )

    best = (
        stopper.best_params if stopper.best_params is not None
        else _snapshot()
    )

    metrics: Dict[str, float] = {}
    if test_data is not None:
        metrics = evaluate_nf_resnet(
            encoder,
            {"params": best["encoder"], **enc_stats},
            flows,
            best["heads"],
            test_data, hp, mean, std, stages=stages,
            figures_dir=figures_dir, logger=logger,
        )
        if logger is not None:
            logger.log({**metrics, "stage": "eval"})

    return TrainResult(
        head_params=best,
        # NOT enc_variables: its param buffers were donated by train_step;
        # the best-snapshot copy (+ unchanged batch_stats) is the live one
        encoder_params={"params": best["encoder"], **enc_stats},
        history=history,
        metrics=metrics,
        epochs_ran=epochs_ran,
        best_epoch=stopper.best_epoch,
        best_valid_loss=float(stopper.best_loss) if stopper.best_loss is not None else float("nan"),
        encoder=encoder,
        head=None,
    )


def train_vae(
    hp: HyperParams,
    data: DataPipeline,
    test_data: Optional[DataPipeline] = None,
    model: Optional[nn.Module] = None,
    logger: Any = None,
    figures_dir: Optional[str] = None,
) -> TrainResult:
    """Train the variational auto-encoder: loss = MSE + KL (reference
    LearnerRecon.learn_vae, src/pipeline/LearnerRecon.py:165-276 — dead code
    there since no MODEL_DICT key builds the VAE; functional here)."""
    from vit_ad_tpu.data.loader import preprocess
    from vit_ad_tpu.models.vae import VariationalAutoEncoder
    from vit_ad_tpu.pipeline.eval import evaluate_recon

    rng = jax.random.key(hp.seed)
    if model is None:
        model = VariationalAutoEncoder(img_size=hp.img_size, dtypes=hp.dtypes)

    mean, std = _norm_stats(hp, data)
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

    rng, k1, k2 = jax.random.split(rng, 3)
    variables = model.init(
        k1, jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32),
        k2, train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    mc = _mesh_setup(hp)
    if mc is not None:
        params = mc.shard_params(params)
        batch_stats = mc.replicate(batch_stats)
    tx = torch_adam(hp.learning_rate, hp.weight_decay)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, images_u8, valid, step_rng):
        x = preprocess(images_u8, mean_j, std_j)
        # ONE encode: the KL must penalize the posterior the recon's z was
        # sampled from (reference learn_vae uses the same forward's
        # latent_space.mu/log_var) — a second train=False encode sees
        # different BatchNorm statistics and doubles encoder FLOPs
        (out, mu, log_var), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, step_rng, train=True, mutable=["batch_stats"],
            method=VariationalAutoEncoder.forward_with_posterior,
        )
        err = jnp.mean(
            jnp.square(out.reconstruction.astype(jnp.float32) - x.astype(jnp.float32)),
            axis=(1, 2, 3),
        )
        mse = jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        # per-example KL, masked like the MSE (padded rows must not count)
        kl_i = -0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=-1)
        kl = jnp.sum(kl_i * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return mse + kl, updates["batch_stats"]

    # donated for the same reason as train_recon's loop step (see above)
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, images_u8, valid, step_rng):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images_u8, valid, step_rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            jax.tree.map(lambda p, u: p + u, params, updates),
            new_stats, opt_state, loss,
        )

    @jax.jit
    def valid_loss_fn(params, batch_stats, images_u8, valid, step_rng):
        x = preprocess(images_u8, mean_j, std_j)
        out, mu, log_var = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, step_rng,
            train=False, method=VariationalAutoEncoder.forward_with_posterior,
        )
        err = jnp.mean(
            jnp.square(out.reconstruction.astype(jnp.float32) - x.astype(jnp.float32)),
            axis=(1, 2, 3),
        )
        mse = jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        kl_i = -0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=-1)
        return mse + jnp.sum(kl_i * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    # scan-of-batches epochs (see train_mdn): one dispatch per epoch over
    # the stacked staged uint8 batches; features.image_epoch_staging picks
    # stack vs per-batch staging vs lazy fallback
    train_stack, train_batches_dev = image_epoch_staging(
        lambda: data.train_batches(hp.prefetch), mc
    )
    valid_stack, valid_batches_dev = image_epoch_staging(
        lambda: data.valid_batches(hp.prefetch), mc
    )

    def _scan_body(carry, xs):
        params, batch_stats, opt_state, r = carry
        images, valid = xs
        r, k = jax.random.split(r)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, images, valid, k)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, new_stats, opt_state, r), loss

    train_epoch_scan = make_scan_epoch(_scan_body, n_carry=4)

    @jax.jit
    def valid_epoch_scan(params, batch_stats, epoch_rng, images_s, valid_s):
        def body(r, xs):
            images, valid = xs
            r, k = jax.random.split(r)
            return r, valid_loss_fn(params, batch_stats, images, valid, k)
        epoch_rng, losses = jax.lax.scan(
            body, epoch_rng, (images_s, valid_s)
        )
        return epoch_rng, losses

    def train_epoch(epoch):
        nonlocal rng, params, batch_stats, opt_state
        if train_stack is not None:
            params, batch_stats, opt_state, rng, losses = train_epoch_scan(
                params, batch_stats, opt_state, rng,
                train_stack.feats, train_stack.valid,
            )
            return (
                _stacked_weighted_mean(losses, train_stack.weights),
                float(train_stack.weights.sum()),
            )
        losses, weights = [], []
        for images, valid, w in train_batches_dev():
            rng, k = jax.random.split(rng)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, images, valid, k
            )
            losses.append(loss)
            weights.append(w)
        return _weighted_mean(losses, weights), float(np.sum(weights))

    def valid_epoch():
        nonlocal rng
        if valid_stack is not None:
            rng, losses = valid_epoch_scan(
                params, batch_stats, rng, valid_stack.feats, valid_stack.valid
            )
            return _stacked_weighted_mean(losses, valid_stack.weights)
        vlosses, vweights = [], []
        for images, valid, w in valid_batches_dev():
            rng, k = jax.random.split(rng)
            vlosses.append(valid_loss_fn(params, batch_stats, images, valid, k))
            vweights.append(w)
        return _weighted_mean(vlosses, vweights)

    history, epochs_ran, stopper = run_epochs(
        hp, train_epoch, valid_epoch,
        lambda: {"params": params, "batch_stats": batch_stats}, logger,
    )

    best = (
        stopper.best_params
        if stopper.best_params is not None
        else {"params": params, "batch_stats": batch_stats}
    )

    metrics: Dict[str, float] = {}
    # reconstruction-error evaluation needs a deterministic forward; the VAE
    # decodes from the posterior mean at eval — reuse evaluate_recon via a
    # mean-decoding adapter module
    if test_data is not None:
        from vit_ad_tpu.models.vae import VariationalAutoEncoder as VAE

        def eval_maps(variables, test, hp, mean, std):
            mean_jj = None if mean is None else jnp.asarray(mean)
            std_jj = None if std is None else jnp.asarray(std)

            @jax.jit
            def error_maps(v, images_u8):
                x = preprocess(images_u8, mean_jj, std_jj)
                mu, _ = model.apply(
                    v, x, train=False, method=VAE.encode
                )
                recon = model.apply(
                    v, mu, train=False, method=lambda m, z, train: m.decoder(z, train=train)
                )
                err = jnp.square(recon.astype(jnp.float32) - x.astype(jnp.float32))
                return jnp.mean(err, axis=-1)

            from vit_ad_tpu.pipeline.eval import _collect
            from vit_ad_tpu.pipeline import metrics as M

            maps, labels, gt, origs = _collect(
                test.test_batches(hp.prefetch),
                lambda im: error_maps(variables, im),
                keep_origs=9 if figures_dir else 0,
            )
            image_scores = maps.reshape(maps.shape[0], -1).max(axis=1)
            result = M.EvalResult(
                image_scores=image_scores,
                image_labels=labels.astype(np.float64),
                pixel_scores=maps,
                pixel_labels=gt.astype(np.float64),
                origs=origs,
            )
            out = M.calc_all_metrics(result, hp.fp_threshold)
            if figures_dir:
                from vit_ad_tpu.pipeline.eval import save_eval_figures

                save_eval_figures(result, out, figures_dir, hp.fp_threshold,
                                  vmax=0.15, logger=logger)
            return out

        metrics = eval_maps(best, test_data, hp, mean, std)
        if logger is not None:
            logger.log({**metrics, "stage": "eval"})

    return TrainResult(
        head_params=best,
        encoder_params=None,
        history=history,
        metrics=metrics,
        epochs_ran=epochs_ran,
        best_epoch=stopper.best_epoch,
        best_valid_loss=float(stopper.best_loss) if stopper.best_loss is not None else float("nan"),
        encoder=None,
        head=model,
    )
