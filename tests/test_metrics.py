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
        "aupro_score_0.3fp",
        "fp_thres",
    }
    assert 0.0 <= out["aupro_score_0.3fp"] <= 1.0
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


# ---- true AUPRO (per-region overlap, the standard MVTec protocol) ----------


def _aupro_bruteforce(labels, scores, fpr_limit=0.3):
    """Literal threshold sweep: at every distinct score value t, predictions
    = (scores >= t); PRO = mean over connected GT regions of the covered
    fraction; FPR over good pixels. Trapezoid up to fpr_limit with linear
    interpolation at the crossing, normalized. Independent of the
    vectorized implementation (explicit masks per threshold)."""
    from scipy import ndimage

    labels = np.asarray(labels)
    scores = np.asarray(scores, np.float64)
    region_masks = []
    for i in range(labels.shape[0]):
        comp, n = ndimage.label(labels[i] != 0)
        for r in range(1, n + 1):
            region_masks.append((i, comp == r))
    neg_mask = labels == 0
    pts = []
    for t in np.unique(scores)[::-1]:  # descending
        pred = scores >= t
        pro = np.mean([pred[i][m].mean() for i, m in region_masks])
        fpr = pred[neg_mask].mean()
        pts.append((fpr, pro))
    fpr = np.array([p[0] for p in pts])
    pro = np.array([p[1] for p in pts])
    if fpr[0] > 0:
        fpr, pro = np.r_[0.0, fpr], np.r_[0.0, pro]
    # clip at the limit
    if fpr[-1] > fpr_limit:
        j = int(np.argmax(fpr > fpr_limit))
        w = (fpr_limit - fpr[j - 1]) / (fpr[j] - fpr[j - 1])
        pro_at = pro[j - 1] + w * (pro[j] - pro[j - 1])
        fpr = np.r_[fpr[:j], fpr_limit]
        pro = np.r_[pro[:j], pro_at]
    return float(np.trapezoid(pro, fpr) / fpr_limit)


@pytest.mark.parametrize("limit", [0.3, 0.1, 1.0])
def test_aupro_matches_bruteforce(rng, limit):
    n, h, w = 3, 12, 12
    labels = np.zeros((n, h, w))
    labels[0, 2:5, 2:5] = 1          # one 3x3 region
    labels[1, 1:3, 8:11] = 1         # two regions in one image
    labels[1, 7:11, 1:4] = 1
    labels[2, 5, 5] = 1              # single-pixel region
    scores = rng.normal(size=(n, h, w)) * 0.5 + labels
    got = M.aupro_score(labels, scores, fpr_limit=limit)
    want = _aupro_bruteforce(labels, scores, fpr_limit=limit)
    assert got == pytest.approx(want, abs=1e-12)
    assert 0.0 <= got <= 1.0


def test_aupro_perfect_and_inverted():
    labels = np.zeros((1, 8, 8))
    labels[0, 2:5, 3:6] = 1
    scores = labels + 0.0
    assert M.aupro_score(labels, scores) == pytest.approx(1.0)
    # inverted scores: regions only covered at FPR 1, nothing below the limit
    assert M.aupro_score(labels, -scores, fpr_limit=0.3) == pytest.approx(
        0.0, abs=1e-12
    )


def test_aupro_region_weighting_differs_from_pixel_metrics(rng):
    """A tiny region fully missed drags AUPRO by 1/n_regions regardless of
    its pixel count — the property the thresholded-AUROC 'pro' lacks."""
    labels = np.zeros((1, 16, 16))
    labels[0, 0:8, 0:8] = 1          # 64-pixel region, perfectly scored
    labels[0, 12, 12] = 1            # 1-pixel region, missed entirely
    scores = np.zeros((1, 16, 16))
    scores[0, 0:8, 0:8] = 1.0
    scores[0, 12, 12] = -1.0
    # region average: (1 + 0) / 2 at every sub-limit FPR
    assert M.aupro_score(labels, scores, fpr_limit=0.3) == pytest.approx(0.5)


def test_aupro_needs_both_classes():
    with pytest.raises(ValueError):
        M.aupro_score(np.zeros((1, 4, 4)), np.zeros((1, 4, 4)))
    with pytest.raises(ValueError):
        M.aupro_score(np.ones((1, 4, 4)), np.zeros((1, 4, 4)))


def test_aupro_subsampled_grid_close(rng):
    labels = np.zeros((2, 16, 16))
    labels[:, 4:9, 4:9] = 1
    scores = rng.normal(size=(2, 16, 16)) * 0.4 + labels
    exact = M.aupro_score(labels, scores)
    approx = M.aupro_score(labels, scores, max_steps=64)
    assert approx == pytest.approx(exact, abs=0.02)
