"""Host score tail: device payloads → (image_scores, pixel_scores).

Deliberately light: imports jax + numpy + `ops/resize.py` only (no flax, no
models, no pipeline), so an AOT serving site (`serving/aot.ServingBundle`)
can score without the model zoo in its import graph. `pipeline/eval.py`
imports from here — the evaluators and the serving bundles share this ONE
code path, which is what keeps bundle scores bit-identical to evaluator
scores (tests/test_serving_export.py).

Reference parity notes live on each function; the parity-sensitive MDN
semantics mirror reference src/classes/MixtureDensityNetwork.py:75-97 and
src/pipeline/ValidatorMDN.py:104-185.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from vit_ad_tpu.ops.resize import interpolate_bilinear


def ll_to_anomaly_maps(ll: np.ndarray, img_size: int,
                       ref_max: Optional[float] = None):
    """The parity-sensitive MDN core, in ONE place for the transformer and
    per-stage ResNet paths: global-max probability normalization (reference
    get_probability_map, MixtureDensityNetwork.py:75-97 — global over the
    scored set, not per batch; pipeline/eval module docstring), sqrt-side
    reshape, bilinear upsample (align_corners=True, reference ValidatorMDN.py
    :137-162) and the final `(x * -1) + 1` inversion (:170-172).

    `ref_max`: optional fixed normalizer (e.g. the training set's max
    log-likelihood baked into a serving bundle) so scores are comparable
    ACROSS calls; probabilities are clamped at 1 where ll exceeds it. None
    (default) = the reference's per-set max — bit-identical to the
    reference semantics.

    Returns (anomaly_maps [N, H, W], prob [N, P])."""
    m = ll.max() if ref_max is None else float(ref_max)
    # minimum(.,0) is an exact no-op when m == ll.max(); with a fixed
    # ref_max it clamps prob at 1 for samples more likely than the
    # reference set's best
    prob = np.exp(np.minimum(ll - m, 0.0))  # [N, P] in [0, 1]
    side = int(round(np.sqrt(prob.shape[1])))
    up = np.asarray(
        interpolate_bilinear(
            jnp.asarray(prob.reshape(-1, side, side)),
            img_size, img_size, align_corners=True,
        )
    )
    return (up * -1.0) + 1.0, prob


def payload_to_scores(kind: str, payload, img_size: int,
                      ref_max_ll: Optional[Sequence[float]] = None):
    """Host score tail shared by the evaluators and AOT serving bundles:
    concatenated per-batch device payloads → (image_scores [N],
    pixel_scores [N, H, W]). Per kind:

      * mdn        — [N, P] log-liks → global-set prob normalization +
                     upsample (`ll_to_anomaly_maps`); image score =
                     inverted min patch prob (reference ValidatorMDN.py:133)
      * mdn_resnet — tuple of per-stage log-liks → per-stage anomaly maps,
                     averaged; image score = max over the mean map
      * nf / nf_resnet / recon — [N, H, W] anomaly maps; image score = max
                     (reference ValidatorNF.py:137-142, ValidatorRecon.py:115-117)

    `ref_max_ll`: optional per-stage fixed MDN normalizers (one float for
    `mdn`, one per stage for `mdn_resnet`) for cross-call comparable
    serving scores; None = reference per-call-set semantics.
    """
    if kind == "mdn":
        rm = None if ref_max_ll is None else ref_max_ll[0]
        pixel_scores, prob = ll_to_anomaly_maps(payload, img_size, rm)
        image_scores = (prob.min(axis=1) * -1.0) + 1.0
        return image_scores, pixel_scores
    if kind == "mdn_resnet":
        rms = [None] * len(payload) if ref_max_ll is None else list(ref_max_ll)
        stage_anomalies = [
            ll_to_anomaly_maps(np.asarray(p), img_size, rm)[0]
            for p, rm in zip(payload, rms)
        ]
        pixel_scores = np.mean(np.stack(stage_anomalies, -1), axis=-1)
        image_scores = pixel_scores.reshape(pixel_scores.shape[0], -1).max(axis=1)
        return image_scores, pixel_scores
    if kind in ("nf", "nf_resnet", "recon"):
        maps = np.asarray(payload)
        return maps.reshape(maps.shape[0], -1).max(axis=1), maps
    raise ValueError(f"unknown score kind {kind!r}")


def payload_ref_max_ll(kind: str, payload) -> Optional[list]:
    """Per-stage max log-likelihoods of a payload set — the value a serving
    bundle bakes as its fixed MDN normalizer (computed over e.g. the
    training images at export time). None for kinds without one."""
    if kind == "mdn":
        return [float(np.asarray(payload).max())]
    if kind == "mdn_resnet":
        return [float(np.asarray(p).max()) for p in payload]
    return None
