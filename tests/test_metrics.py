"""Metrics engine golden tests against sklearn (the reference's metric
backend, src/util/ValidationHelper.py:42-183)."""

import numpy as np
import pytest
import sklearn.metrics as skm

from vit_ad_tpu.pipeline import metrics as M


def _random_problem(rng, n=500, with_ties=False):
    labels = (rng.uniform(size=n) < 0.3).astype(np.int64)
    scores = rng.normal(size=n) + labels * rng.uniform(0.5, 1.5)
    if with_ties:
        scores = np.round(scores, 1)
    return labels, scores


@pytest.mark.parametrize("ties", [False, True])
def test_roc_auc_matches_sklearn(rng, ties):
    labels, scores = _random_problem(rng, with_ties=ties)
    assert M.roc_auc_score(labels, scores) == pytest.approx(
        skm.roc_auc_score(labels, scores), abs=1e-12
    )


@pytest.mark.parametrize("ties", [False, True])
def test_roc_curve_matches_sklearn(rng, ties):
    labels, scores = _random_problem(rng, n=200, with_ties=ties)
    fpr, tpr, thr = M.roc_curve(labels, scores)
    sk_fpr, sk_tpr, sk_thr = skm.roc_curve(labels, scores, drop_intermediate=False)
    np.testing.assert_allclose(fpr, sk_fpr, atol=1e-12)
    np.testing.assert_allclose(tpr, sk_tpr, atol=1e-12)
    np.testing.assert_allclose(thr[1:], sk_thr[1:], atol=1e-12)


@pytest.mark.parametrize("ties", [False, True])
def test_prauc_matches_sklearn_trapezoid(rng, ties):
    labels, scores = _random_problem(rng, with_ties=ties)
    precision, recall, _ = skm.precision_recall_curve(labels, scores)
    want = skm.auc(x=recall, y=precision)  # exactly what the reference computes
    assert M.prauc_score(labels, scores) == pytest.approx(want, abs=1e-12)


def test_calc_threshold_semantics(rng):
    labels, scores = _random_problem(rng, n=300)
    for cap in (0.1, 0.3, 0.5):
        thr = M.calc_threshold(scores, labels, cap)
        # achieved FPR at that threshold must respect the cap
        pred = scores > thr
        fpr = np.sum(pred & (labels == 0)) / np.sum(labels == 0)
        assert fpr <= cap + 1e-12
        # reference computation for cross-check
        sk_fpr, sk_tpr, sk_thr = skm.roc_curve(labels, scores)
        idx = np.where(sk_fpr <= cap)
        want = sk_thr[np.argmax(sk_tpr[idx])]
        assert thr == pytest.approx(want)


def test_calc_all_metrics_names_and_values(rng):
    n, h, w = 40, 16, 16
    image_labels = np.r_[np.zeros(20), np.ones(20)]
    image_scores = rng.normal(size=n) + image_labels
    pixel_labels = np.zeros((n, h, w))
    pixel_labels[20:, 4:8, 4:8] = 1
    pixel_scores = rng.normal(size=(n, h, w)) * 0.3 + pixel_labels

    res = M.EvalResult(
        image_scores=image_scores,
        image_labels=image_labels,
        pixel_scores=pixel_scores,
        pixel_labels=pixel_labels,
    )
    out = M.calc_all_metrics(res, fp_threshold=0.3)
    assert set(out) == {
        "image_auroc_score",
        "pixel_auroc_score",
        "image_prauc_score",
        "pro_score_0.3fp",
        "fp_thres",
    }
    assert out["image_auroc_score"] == pytest.approx(
        skm.roc_auc_score(image_labels, image_scores)
    )
    assert out["pixel_auroc_score"] == pytest.approx(
        skm.roc_auc_score(pixel_labels.ravel(), pixel_scores.ravel())
    )
    # PRO: sklearn AUROC of the thresholded map
    thr = M.calc_threshold(pixel_scores.ravel(), pixel_labels.ravel(), 0.3)
    fluently = np.where(pixel_scores > thr, pixel_scores, 0)
    assert out["pro_score_0.3fp"] == pytest.approx(
        skm.roc_auc_score(pixel_labels.ravel(), fluently.ravel())
    )
    assert 0.65 < out["image_auroc_score"] <= 1.0
