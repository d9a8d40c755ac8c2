"""Validators: model → anomaly scores → metric suite.

Functional redesign of the reference Validator classes (reference
src/pipeline/ValidatorMDN.py, ValidatorNF.py, ValidatorRecon.py). Scoring
semantics preserved per head:

  * MDN — probability map per patch; image score = min over patches
    (ValidatorMDN.py:133); pixel map = (√P,√P) reshape + bilinear upsample
    with align_corners=True (:137-162); anomaly score = (x * -1) + 1 (:170-172).
    One deliberate fix: the probability map is normalized by the max
    log-likelihood over the WHOLE test set, not per batch — the reference's
    per-batch max (MixtureDensityNetwork.py:89-92, its own TODO) makes scores
    depend on batch composition. AUROC is rank-based, so with a global shift
    the ranking — and every reported metric — is unchanged for any fixed set.
  * NF — anomaly map from the flow; image score = max over map
    (ValidatorNF.py:137-142).
  * Recon — anomaly map = channel-mean squared error; image score = max
    (ValidatorRecon.py:110-117).
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from vit_ad_tpu.config import HyperParams
from vit_ad_tpu.data.loader import Batch, DataPipeline, preprocess
from vit_ad_tpu.models.mdn import GaussianMDN
from vit_ad_tpu.ops.resize import interpolate_bilinear  # noqa: F401 (re-export)
from vit_ad_tpu.scoring import ll_to_anomaly_maps, payload_to_scores  # noqa: F401
from vit_ad_tpu.parallel.context import MeshContext
from vit_ad_tpu.parallel.multihost import fetch_global
from vit_ad_tpu.pipeline import metrics as M


class ScoreOutput(NamedTuple):
    """Label-free scoring payload: the `score_*` half of each validator,
    shared with the standalone scoring CLI (`cli/score.py`). `labels`/`masks`
    are whatever the data layer path-inferred — the `evaluate_*` metric
    wrappers consume them; unlabeled-folder scoring ignores them."""

    image_scores: np.ndarray            # [N] anomaly score per image
    pixel_scores: np.ndarray            # [N, H, W] anomaly map per image
    labels: np.ndarray                  # [N] path-inferred 0/1
    masks: np.ndarray                   # [N, H, W] ground-truth or zeros
    origs: Optional[np.ndarray]         # first keep_origs uint8 images


def _metrics_and_figures(
    s: ScoreOutput, hp: HyperParams, figures_dir: Optional[str],
    logger: Any, vmax: Optional[float] = None, recons=None,
) -> Dict[str, float]:
    """Shared metrics tail of every evaluator: ScoreOutput → metric dict
    (+ optional eval figures)."""
    result = M.EvalResult(
        image_scores=s.image_scores,
        image_labels=s.labels.astype(np.float64),
        pixel_scores=s.pixel_scores,
        pixel_labels=s.masks.astype(np.float64),
        origs=s.origs,
        recons=recons,
    )
    out = M.calc_all_metrics(result, hp.fp_threshold)
    if figures_dir:
        kw = {} if vmax is None else {"vmax": vmax}
        save_eval_figures(result, out, figures_dir, hp.fp_threshold,
                          logger=logger, **kw)
    return out


def _eval_scan_chunk() -> int:
    """Batches per device dispatch for the eval scan protocol; 0 means
    per-batch dispatch. Default 8 on accelerators: per-batch scoring pays
    the axon tunnel's ~24 ms dispatch+fetch turnaround per batch, which
    dominates any trunk faster than ~40 ms/batch (PERF.md's dispatch-bound
    protocol findings — ResNet e2e read 2.1x slow under per-batch
    dispatch). On CPU there is no tunnel to amortize and the scan graph
    would be a second compile, so the default is 0 there.
    VITAD_EVAL_CHUNK overrides either way."""
    env = os.environ.get("VITAD_EVAL_CHUNK")
    if env is not None:
        return max(0, int(env))
    return 8 if jax.default_backend() != "cpu" else 0


# The parity-sensitive MDN score core and the shared payload→scores tail
# live in the dependency-light vit_ad_tpu/scoring.py so AOT serving sites
# can import them without the model zoo; re-exported here because this
# module is their historical home and the evaluators' callers import them
# from pipeline.eval.
_ll_to_anomaly_maps = ll_to_anomaly_maps


def _eval_mesh(hp: HyperParams) -> Optional[MeshContext]:
    """Evaluators self-setup the mesh from hp.mesh (same config the trainers
    consume) so `--mesh DxM` shards scoring batches over the data axis too —
    eval-only flows (validation_loop, validate_pth*) inherit multi-device
    scoring without new plumbing. Returns None (single-device) by default."""
    return MeshContext.from_hp(hp)


def _scan_scorer(fn, *params):
    """Build the scan-of-batches variant of a per-batch score fn: one jit
    dispatch scores [chunk, B, ...] pre-staged batches via lax.scan, payloads
    stay on device until the caller fetches. Params stay explicit jit
    arguments (closure-captured arrays serialize into the axon
    remote-compile payload)."""

    def chunk_fn(*args):
        *ps, ims = args
        return jax.lax.scan(lambda _, im: (None, fn(*ps, im)), None, ims)[1]

    chunk_j = jax.jit(chunk_fn)
    return lambda ims: chunk_j(*params, ims)


def _collect(
    batches, score_fn, keep_origs: int = 0, scan_score=None,
    mc: Optional[MeshContext] = None,
) -> Tuple[Any, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Run a jit score_fn over test batches; returns (per-image payloads,
    labels, masks, first `keep_origs` original uint8 images) with padding
    trimmed. A score_fn returning a tuple (e.g. per-stage outputs) yields a
    tuple of concatenated payload arrays.

    When `scan_score` is given and the scan protocol is enabled
    (`_eval_scan_chunk`), batches are staged to the device in groups and
    scored `chunk` per dispatch, all dispatches queued before the first
    fetch — the bench-proven streaming pattern, now the validators' own.
    The trailing group is padded with repeats of the last batch (marked
    invalid and trimmed on host) so ONE compiled executable covers every
    test-set length. With a MeshContext, batches are sharded over the mesh
    data axis (DP scoring) in either protocol.

    `batches` is an iterable OR a factory `fn(host=False) -> iterable`: the
    scan path requests HOST batches from a factory (it stages chunks to the
    device itself — eagerly device_put batches would each cost a
    device→host fetch just to be re-staged), while the per-batch path keeps
    device prefetch."""
    chunk = _eval_scan_chunk() if scan_score is not None else 0
    if chunk > 1:
        bs = batches(host=True) if callable(batches) else batches
        return _collect_scan(bs, scan_score, chunk, keep_origs, mc)
    if callable(batches):
        batches = batches()
    payloads, labels, masks, origs = [], [], [], []
    kept = 0
    for batch in batches:
        ims = batch.images
        if mc is not None:
            mc.check_batch(ims.shape[0])
            ims = mc.shard_batch(ims)
        out = score_fn(ims)
        n = int(batch.valid.sum())
        # fetch_global = np.asarray single-host; allgathers the data-axis
        # shards first when the mesh spans hosts (parallel/multihost.py)
        if isinstance(out, tuple):
            payloads.append([fetch_global(o)[:n] for o in out])
        else:
            payloads.append(fetch_global(out)[:n])
        labels.append(np.asarray(batch.labels[:n]))
        masks.append(np.asarray(batch.masks[:n]))
        if kept < keep_origs:
            take = min(n, keep_origs - kept)
            origs.append(np.asarray(batch.images[:take]))
            kept += take
    if payloads and isinstance(payloads[0], list):
        cat = tuple(
            np.concatenate([p[i] for p in payloads], 0)
            for i in range(len(payloads[0]))
        )
    else:
        cat = np.concatenate(payloads, 0)
    return (
        cat,
        np.concatenate(labels, 0),
        np.concatenate(masks, 0),
        np.concatenate(origs, 0) if origs else None,
    )


def _collect_scan(
    batches, scan_score, chunk: int, keep_origs: int,
    mc: Optional[MeshContext],
) -> Tuple[Any, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Scan-protocol body of `_collect`. Test sets are small (MVTec-scale:
    ≤ a few hundred images), so the whole uint8 set is staged host-side
    once; device results are fetched only after every dispatch is queued."""
    bl = list(batches)
    if not bl:
        raise ValueError("no test batches to evaluate")
    ns = [int(b.valid.sum()) for b in bl]
    if mc is not None:
        mc.check_batch(bl[0].images.shape[0])
        sharding = NamedSharding(mc.mesh, P(None, "data"))
    pad = (-len(bl)) % chunk
    imgs = np.stack([b.images for b in bl] + [bl[-1].images] * pad)
    outs = []
    for s in range(0, len(bl) + pad, chunk):
        staged = imgs[s:s + chunk]
        staged = (
            jax.device_put(staged, sharding) if mc is not None
            else jnp.asarray(staged)
        )
        outs.append(scan_score(staged))  # queue the dispatch; fetch below
    host = [jax.tree.map(fetch_global, o) for o in outs]  # ONE draining pass
    flat: list = []
    for o in host:
        group = o if isinstance(o, tuple) else (o,)
        for i in range(group[0].shape[0]):
            flat.append(tuple(g[i] for g in group))
    payloads = [
        tuple(g[:n] for g in flat[i]) for i, n in enumerate(ns)
    ]
    if isinstance(host[0], tuple):
        cat: Any = tuple(
            np.concatenate([p[j] for p in payloads], 0)
            for j in range(len(payloads[0]))
        )
    else:
        cat = np.concatenate([p[0] for p in payloads], 0)
    labels = np.concatenate([b.labels[:n] for b, n in zip(bl, ns)], 0)
    masks = np.concatenate([b.masks[:n] for b, n in zip(bl, ns)], 0)
    origs = None
    if keep_origs:
        acc, kept = [], 0
        for b, n in zip(bl, ns):
            if kept >= keep_origs:
                break
            take = min(n, keep_origs - kept)
            acc.append(b.images[:take])
            kept += take
        origs = np.concatenate(acc, 0) if acc else None
    return cat, labels, masks, origs


def save_eval_figures(
    result: M.EvalResult,
    metrics: Dict[str, float],
    out_dir: str,
    fp_threshold: float = 0.3,
    vmax: float = 1.0,
    logger: Any = None,
) -> Dict[str, str]:
    """Write the reference's six eval figure artifacts into `out_dir`
    (reference ValidationHelper.calc_all_metrics emits heatmap / ground-truth
    / overlay / recon grids and ROC+PR displays,
    src/util/ValidationHelper.py:149-153,193-209 via ImageHelper.py:66-150):

      heatmaps.png       FPR-thresholded anomaly-map grid (jet)
      ground_truth.png   mask grid
      overlay.png        heatmap over the original images
      recons.png         reconstruction grid (recon head only)
      roc_curve.png      image-level ROC display
      pr_curve.png       image-level PR display

    Figures are also logged to wandb when `logger` has an active run.
    Returns {figure name: path}."""
    import matplotlib.pyplot as plt

    from vit_ad_tpu.utils import images as I

    os.makedirs(out_dir, exist_ok=True)
    paths: Dict[str, str] = {}

    thresholded = M.create_heatmap_from_scores(
        result.pixel_scores, result.pixel_labels, fp_threshold
    )
    origs = result.origs
    if origs is not None and origs.dtype == np.uint8:
        origs = origs.astype(np.float32) / 255.0
    fig_heat, fig_gt, fig_overlay = I.plot_heatmaps(
        thresholded, result.pixel_labels, originals=origs, vmax=vmax
    )
    figures = {"heatmaps": fig_heat, "ground_truth": fig_gt,
               "overlay": fig_overlay}
    if result.recons is not None:
        figures["recons"] = I.plot_recons(result.recons)

    fpr, tpr, _ = M.roc_curve(result.image_labels, result.image_scores)
    figures["roc_curve"] = I.plot_roc_curve(
        fpr, tpr, metrics.get("image_auroc_score", float("nan"))
    )
    precision, recall, _ = M.precision_recall_curve(
        result.image_labels, result.image_scores
    )
    figures["pr_curve"] = I.plot_pr_curve(
        precision, recall, metrics.get("image_prauc_score", float("nan"))
    )

    for name, fig in figures.items():
        path = os.path.join(out_dir, f"{name}.png")
        fig.savefig(path, dpi=100)
        plt.close(fig)
        paths[name] = path
        if logger is not None:
            logger.log_figure(name, path)
    return paths


def _mdn_loglik(mdn: GaussianMDN, variables: Any, feats: jax.Array,
                hp: HyperParams) -> jax.Array:
    """Per-feature log-likelihood for scoring: the Pallas kernel by default
    on TPU targets (VMEM-resident per-component mu/sigma, online logsumexp;
    +76% at K=100 / +34% at K=150 over the XLA scan at batch 128 on v5e),
    the differentiable XLA scan otherwise. VITAD_PALLAS_GMM=0/1 overrides."""
    from vit_ad_tpu.ops.pallas.gmm import (
        mdn_log_likelihood_pallas,
        use_pallas_gmm,
    )

    # VMEM fit: double-buffered [1,D,D] mu+sigma blocks + row tile + scratch.
    # Empirical calibration on v5e: D=768 f32 row_tile=256 compiles (~14 MB),
    # row_tile=512 does not — so budget 14 MB. Wide heads (ResNet stage-3
    # D=2048) have a d-tiled kernel variant (ops/pallas/gmm.py
    # _kernel_dtiled, round 3) that is hardware-validated for correctness
    # but measured 4-5x SLOWER than the XLA scan at stage-3 shapes
    # (101-124 vs 24 ms; PERF.md) — so they still fall back, UNLESS
    # VITAD_PALLAS_GMM=1 explicitly forces the kernel ("force" must mean
    # force, so A/B measurements are attributed to the right path).
    d = feats.shape[-1]
    wbytes = 2 if hp.dtypes.compute_dtype == jnp.bfloat16 else 4
    est = 2 * 2 * d * d * wbytes + 4 * 256 * d * 4
    fits = est <= 14 * 1024 * 1024 or os.environ.get("VITAD_PALLAS_GMM") == "1"
    if not (use_pallas_gmm() and fits):
        # the XLA K-chunk scan DIRECTLY — not GaussianMDN.log_likelihood,
        # which would dispatch wide heads to the Pallas TRAIN forward
        # (use_pallas_gmm_train now admits D=2048 because the train STEP
        # wins there, but the scoring-only forward loses 4x to the scan at
        # stage-3 eval shapes; PERF.md round 3)
        from vit_ad_tpu.ops import gmm as gmm_ops

        pr = variables["params"]
        f32 = lambda a: a.astype(jnp.float32)
        return gmm_ops.fused_log_likelihood(
            feats,
            f32(pr["w_pi"]), f32(pr["b_pi"]),
            f32(pr["w_sigma"]), f32(pr["b_sigma"]),
            f32(pr["w_mu"]), f32(pr["b_mu"]),
            rng=None, k_chunk=mdn.k_chunk,
        )
    pr = variables["params"]
    return mdn_log_likelihood_pallas(
        feats, pr["w_pi"], pr["b_pi"], pr["w_sigma"], pr["b_sigma"],
        pr["w_mu"], pr["b_mu"],
        interpret=jax.default_backend() == "cpu",
        matmul_dtype=hp.dtypes.compute_dtype,
    )


def make_mdn_batch_fn(encoder: nn.Module, mdn: GaussianMDN, hp: HyperParams,
                      mean_j, std_j):
    """Per-batch MDN device scorer `(enc_params, mdn_params, images_u8) →
    [B, P]` patch log-likelihood means — the device half of `score_mdn`, and
    the graph the AOT serving exporter (serving/aot.py) bakes params into."""

    def loglik_map(ep, mp, images_u8):
        x = preprocess(images_u8, mean_j, std_j)
        feats = encoder.apply(ep, x, block_index=hp.block_index).patch_embedding
        return jnp.mean(_mdn_loglik(mdn, mp, feats, hp), axis=2)  # [B, P]

    return loglik_map


def make_nf_batch_fn(encoder: nn.Module, flow, hp: HyperParams,
                     mean_j, std_j):
    """Per-batch NF device scorer `(enc_params, flow_params, images_u8) →
    [B, H, W]` anomaly maps — the device half of `score_nf`."""
    from vit_ad_tpu.models.flow import patch_tokens_to_map

    def anomaly_maps(ep, fpar, images_u8):
        x = preprocess(images_u8, mean_j, std_j)
        feats = encoder.apply(
            ep, x, block_index=hp.block_index
        ).patch_embedding
        out = flow.apply(fpar, patch_tokens_to_map(feats))
        return out.anomaly_score_map  # [B, H, W]

    return anomaly_maps


def make_recon_batch_fn(model: nn.Module, hp: HyperParams, mean_j, std_j):
    """Per-batch recon device scorer `(variables, images_u8) → [B, H, W]`
    channel-mean squared-error maps — the device half of `score_recon`."""

    def error_maps(v, images_u8):
        x = preprocess(images_u8, mean_j, std_j)
        out = model.apply(v, x, train=False)
        err = jnp.square(out.reconstruction.astype(jnp.float32) - x.astype(jnp.float32))
        return jnp.mean(err, axis=-1)  # [B, H, W]

    return error_maps


def make_mdn_resnet_batch_fn(encoder: nn.Module, mdns, hp: HyperParams,
                             mean_j, std_j, stages):
    """Per-batch multi-stage MDN device scorer `(enc_variables, [mdn_params],
    images_u8) → tuple of [B, h·w]` per-stage log-likelihood means — the
    device half of `score_mdn_resnet`."""
    from vit_ad_tpu.models.resnet import ResNetEncoder

    def stage_logliks(ev, mps, images_u8):
        x = preprocess(images_u8, mean_j, std_j)
        maps = encoder.apply(
            ev, x, train=False, method=ResNetEncoder.stage_features
        )
        outs = []
        for i, mdn, p in zip(stages, mdns, mps):
            m = maps[i]
            b, h, w, c = m.shape
            feats = m.reshape(b, h * w, c)
            ll = _mdn_loglik(mdn, p, feats, hp)
            outs.append(jnp.mean(ll, axis=2))  # [B, h*w]
        return tuple(outs)

    return stage_logliks


def make_nf_resnet_batch_fn(encoder: nn.Module, flows, hp: HyperParams,
                            mean_j, std_j, stages):
    """Per-batch multi-stage NF device scorer `(enc_variables, [flow_params],
    images_u8) → [B, H, W]` stage-mean anomaly maps — the device half of
    `score_nf_resnet`."""
    from vit_ad_tpu.models.resnet import ResNetEncoder

    def anomaly_maps(ev, fps, images_u8):
        x = preprocess(images_u8, mean_j, std_j)
        maps = encoder.apply(
            ev, x, train=False, method=ResNetEncoder.stage_features
        )
        stage_maps = []
        for i, flow, p in zip(stages, flows, fps):
            out = flow.apply(p, maps[i])
            stage_maps.append(out.anomaly_score_map)
        return jnp.mean(jnp.stack(stage_maps, -1), axis=-1)  # [B, H, W]

    return anomaly_maps


def score_mdn(
    encoder: nn.Module,
    enc_params: Any,
    mdn: GaussianMDN,
    mdn_params: Any,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    keep_origs: int = 0,
) -> ScoreOutput:
    """MDN scoring pipeline (reference ValidatorMdn.valid_loop_transformer,
    src/pipeline/ValidatorMDN.py:104-185). NOTE: the image score depends on
    the global max log-likelihood of the SET being scored (module
    docstring) — scores are comparable within one call, not across calls."""
    mean_j = None if mean is None else jnp.asarray(mean)
    std_j = None if std is None else jnp.asarray(std)

    # params as jit args (axon remote-compile payload limit; see features.py)
    loglik_map = make_mdn_batch_fn(encoder, mdn, hp, mean_j, std_j)

    loglik_j = jax.jit(loglik_map)
    ll, labels, gt_masks, origs = _collect(
        lambda host=False: test_data.test_batches(hp.prefetch, host=host),
        lambda im: loglik_j(enc_params, mdn_params, im),
        keep_origs=keep_origs,
        scan_score=_scan_scorer(loglik_map, enc_params, mdn_params),
        mc=_eval_mesh(hp),
    )

    # image score from the PRE-upsample patch probabilities (reference
    # ValidatorMDN.py:133: min patch prob, then the final inversion)
    image_scores, pixel_scores = payload_to_scores("mdn", ll, hp.img_size)
    return ScoreOutput(image_scores, pixel_scores, labels, gt_masks, origs)


def evaluate_mdn(
    encoder: nn.Module,
    enc_params: Any,
    mdn: GaussianMDN,
    mdn_params: Any,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    figures_dir: Optional[str] = None,
    logger: Any = None,
) -> Dict[str, float]:
    """score_mdn + the reference metric suite."""
    s = score_mdn(encoder, enc_params, mdn, mdn_params, test_data, hp,
                  mean, std, keep_origs=9 if figures_dir else 0)
    return _metrics_and_figures(s, hp, figures_dir, logger)


def score_nf(
    encoder: nn.Module,
    enc_params: Any,
    flow,
    flow_params: Any,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    keep_origs: int = 0,
) -> ScoreOutput:
    """NF scoring pipeline (reference ValidatorNF.valid_loop_transformer_nf,
    src/pipeline/ValidatorNF.py:107-150): anomaly map from the flow forward;
    image score = max over the map (:137-142)."""
    mean_j = None if mean is None else jnp.asarray(mean)
    std_j = None if std is None else jnp.asarray(std)

    # params as jit args (axon remote-compile payload limit; see features.py)
    anomaly_maps = make_nf_batch_fn(encoder, flow, hp, mean_j, std_j)

    anomaly_j = jax.jit(anomaly_maps)
    maps, labels, gt_masks, origs = _collect(
        lambda host=False: test_data.test_batches(hp.prefetch, host=host),
        lambda im: anomaly_j(enc_params, flow_params, im),
        keep_origs=keep_origs,
        scan_score=_scan_scorer(anomaly_maps, enc_params, flow_params),
        mc=_eval_mesh(hp),
    )
    image_scores, maps = payload_to_scores("nf", maps, hp.img_size)
    return ScoreOutput(image_scores, maps, labels, gt_masks, origs)


def evaluate_nf(
    encoder: nn.Module,
    enc_params: Any,
    flow,
    flow_params: Any,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    figures_dir: Optional[str] = None,
    logger: Any = None,
) -> Dict[str, float]:
    """score_nf + the reference metric suite."""
    s = score_nf(encoder, enc_params, flow, flow_params, test_data, hp,
                 mean, std, keep_origs=9 if figures_dir else 0)
    return _metrics_and_figures(s, hp, figures_dir, logger)


def score_recon(
    model: nn.Module,
    variables: Any,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    keep_origs: int = 0,
) -> ScoreOutput:
    """Reconstruction scoring (reference ValidatorRecon.valid_loop_mse,
    src/pipeline/ValidatorRecon.py:92-136): anomaly map = channel-mean of the
    elementwise squared error; image score = max over the map (:115-117)."""
    mean_j = None if mean is None else jnp.asarray(mean)
    std_j = None if std is None else jnp.asarray(std)

    error_maps = make_recon_batch_fn(model, hp, mean_j, std_j)

    error_j = jax.jit(error_maps)
    maps, labels, gt_masks, origs = _collect(
        lambda host=False: test_data.test_batches(hp.prefetch, host=host),
        lambda im: error_j(variables, im),
        keep_origs=keep_origs,
        scan_score=_scan_scorer(error_maps, variables),
        mc=_eval_mesh(hp),
    )
    image_scores, maps = payload_to_scores("recon", maps, hp.img_size)
    return ScoreOutput(image_scores, maps, labels, gt_masks, origs)


def evaluate_recon(
    model: nn.Module,
    variables: Any,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    figures_dir: Optional[str] = None,
    logger: Any = None,
) -> Dict[str, float]:
    """score_recon + the reference metric suite (recon grids rendered with
    the reference's vmax=0.15, ValidatorRecon.py:60-90)."""
    s = score_recon(model, variables, test_data, hp, mean, std,
                    keep_origs=9 if figures_dir else 0)
    recons = None
    if figures_dir and s.origs is not None:
        mean_j = None if mean is None else jnp.asarray(mean)
        std_j = None if std is None else jnp.asarray(std)

        @jax.jit
        def recon_fn(v, images_u8):
            x = preprocess(images_u8, mean_j, std_j)
            return model.apply(v, x, train=False).reconstruction

        recons = np.asarray(recon_fn(variables, jnp.asarray(s.origs)))
    return _metrics_and_figures(s, hp, figures_dir, logger, vmax=0.15,
                                recons=recons)


def score_mdn_resnet(
    encoder: nn.Module,
    enc_variables: Any,
    mdns,
    mdn_params,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    stages=(2, 3),
    keep_origs: int = 0,
) -> ScoreOutput:
    """Multi-stage MDN scoring (reference ValidatorMdn.valid_loop_resnet,
    src/pipeline/ValidatorMDN.py:186-273): per-stage probability maps are
    upsampled (align_corners=True), inverted to anomaly, and averaged.

    Deviations (documented): probabilities are normalized by the global
    test-set max (not per batch), and the image score is the max over the
    averaged anomaly map — the reference takes min-then-reinvert
    (:247,:261), a double inversion its own survey flags as a bug; the sane
    form matches the transformer path's semantics."""
    mean_j = None if mean is None else jnp.asarray(mean)
    std_j = None if std is None else jnp.asarray(std)

    stage_logliks = make_mdn_resnet_batch_fn(
        encoder, mdns, hp, mean_j, std_j, stages
    )

    stage_j = jax.jit(stage_logliks)
    stage_lls, labels, gt_masks, origs = _collect(
        lambda host=False: test_data.test_batches(hp.prefetch, host=host),
        lambda im: stage_j(enc_variables, list(mdn_params), im),
        keep_origs=keep_origs,
        scan_score=_scan_scorer(stage_logliks, enc_variables, list(mdn_params)),
        mc=_eval_mesh(hp),
    )

    image_scores, pixel_scores = payload_to_scores(
        "mdn_resnet", stage_lls, hp.img_size
    )
    return ScoreOutput(image_scores, pixel_scores, labels, gt_masks, origs)


def evaluate_mdn_resnet(
    encoder: nn.Module,
    enc_variables: Any,
    mdns,
    mdn_params,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    stages=(2, 3),
    figures_dir: Optional[str] = None,
    logger: Any = None,
) -> Dict[str, float]:
    """score_mdn_resnet + the reference metric suite."""
    s = score_mdn_resnet(encoder, enc_variables, mdns, mdn_params, test_data,
                         hp, mean, std, stages=stages,
                         keep_origs=9 if figures_dir else 0)
    return _metrics_and_figures(s, hp, figures_dir, logger)


def score_nf_resnet(
    encoder: nn.Module,
    enc_variables: Any,
    flows,
    flow_params,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    stages=(0, 1, 2),
    keep_origs: int = 0,
) -> ScoreOutput:
    """Multi-stage NF scoring (reference ValidatorNF.valid_loop_resnet_nf,
    src/pipeline/ValidatorNF.py:152-219): mean of the three stage anomaly
    maps, image score = max (:183-199)."""
    mean_j = None if mean is None else jnp.asarray(mean)
    std_j = None if std is None else jnp.asarray(std)

    anomaly_maps = make_nf_resnet_batch_fn(
        encoder, flows, hp, mean_j, std_j, stages
    )

    anomaly_j = jax.jit(anomaly_maps)
    maps, labels, gt_masks, origs = _collect(
        lambda host=False: test_data.test_batches(hp.prefetch, host=host),
        lambda im: anomaly_j(enc_variables, list(flow_params), im),
        keep_origs=keep_origs,
        scan_score=_scan_scorer(anomaly_maps, enc_variables, list(flow_params)),
        mc=_eval_mesh(hp),
    )
    image_scores, maps = payload_to_scores("nf_resnet", maps, hp.img_size)
    return ScoreOutput(image_scores, maps, labels, gt_masks, origs)


def evaluate_nf_resnet(
    encoder: nn.Module,
    enc_variables: Any,
    flows,
    flow_params,
    test_data: DataPipeline,
    hp: HyperParams,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    stages=(0, 1, 2),
    figures_dir: Optional[str] = None,
    logger: Any = None,
) -> Dict[str, float]:
    """score_nf_resnet + the reference metric suite."""
    s = score_nf_resnet(encoder, enc_variables, flows, flow_params,
                        test_data, hp, mean, std, stages=stages,
                        keep_origs=9 if figures_dir else 0)
    return _metrics_and_figures(s, hp, figures_dir, logger)
