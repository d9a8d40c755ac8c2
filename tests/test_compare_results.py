"""tools/compare_results.py — the BASELINE.md §6 acceptance harness.

Locks the reference-CSV parser against the REAL artifacts (the wandb run
exports under /root/reference/csv_results_*, read-only) so the tool is
known-good the moment real MVTec/BTAD data + pretrained weights become
available, and unit-tests the tolerance logic on synthetic rows."""

import csv
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from compare_results import compare, load_ours, load_reference  # noqa: E402

REF = "/root/reference"
MVTEC_15 = {
    "bottle", "cable", "capsule", "carpet", "grid", "hazelnut", "leather",
    "metal_nut", "pill", "screw", "tile", "toothbrush", "transistor", "wood",
    "zipper",
}
METRICS = ["image_auroc_score", "pixel_auroc_score"]

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not mounted"
)


@needs_ref
def test_parses_nf_mvtec_lastblock_baseline():
    """The flagship baseline sheet: 15 categories, per-category image AUROC,
    and the BASELINE.md / SURVEY §6 headline means reproduced from the raw
    export (mean image AUROC 0.9559, pixel 0.9336)."""
    ref = load_reference(
        os.path.join(REF, "csv_results_nf", "nf_mvtec_lastblock.csv"), METRICS
    )
    assert set(ref) == MVTEC_15
    img = np.mean([v["image_auroc_score"] for v in ref.values()])
    pix = np.mean([v["pixel_auroc_score"] for v in ref.values()])
    assert abs(img - 0.9559) < 2e-3, img
    assert abs(pix - 0.9336) < 2e-3, pix


@needs_ref
def test_parses_gmm_backbone_sweep_with_encoder_filter():
    """Backbone-sweep sheets hold several rows per category; --encoder
    narrows them. The EsViT subset must reproduce BASELINE.md's winning
    0.9077 mean image AUROC over its 5 categories."""
    path = os.path.join(REF, "csv_results_gmm", "gmm_different_backbones.csv")
    esvit = load_reference(path, METRICS, encoder="EsVit")
    assert len(esvit) == 5, sorted(esvit)
    mean = np.mean([v["image_auroc_score"] for v in esvit.values()])
    assert abs(mean - 0.9077) < 2e-3, mean
    deit = load_reference(path, METRICS, encoder="Deit")
    assert len(deit) == 5
    assert abs(
        np.mean([v["image_auroc_score"] for v in deit.values()]) - 0.7743
    ) < 2e-3


@needs_ref
def test_parses_btad_sheet():
    ref = load_reference(
        os.path.join(REF, "csv_results_nf", "nf_btad.csv"), METRICS
    )
    assert set(ref) == {"01", "02", "03"}


def _write_ours(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["data_class", "error"] + METRICS
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)


def test_compare_tolerance_and_exit_semantics(tmp_path):
    """Within-tolerance shortfalls and any-size wins pass; a >0.5-pt
    shortfall fails; errored sweep rows and one-sided categories are
    excluded from judgment (listed as gaps)."""
    ours_csv = tmp_path / "results.csv"
    _write_ours(ours_csv, [
        {"data_class": "bottle", "image_auroc_score": "0.996",
         "pixel_auroc_score": "0.990", "error": ""},       # win
        {"data_class": "cable", "image_auroc_score": "0.896",
         "pixel_auroc_score": "0.940", "error": ""},       # -0.4 pts: ok
        {"data_class": "carpet", "image_auroc_score": "0.80",
         "pixel_auroc_score": "0.90", "error": ""},        # -10 pts: fail
        {"data_class": "grid", "image_auroc_score": "0.99",
         "pixel_auroc_score": "0.99", "error": "crashed"}, # excluded
    ])
    ours = load_ours(str(ours_csv), METRICS)
    assert set(ours) == {"bottle", "cable", "carpet"}

    ref = {
        "bottle": {"image_auroc_score": 0.990, "pixel_auroc_score": 0.985},
        "cable": {"image_auroc_score": 0.900, "pixel_auroc_score": 0.940},
        "carpet": {"image_auroc_score": 0.900, "pixel_auroc_score": 0.950},
        "zipper": {"image_auroc_score": 0.950, "pixel_auroc_score": 0.950},
    }
    lines, all_ok, _ = compare(ours, ref, METRICS, tolerance=0.005)
    text = "\n".join(lines)
    assert not all_ok
    assert "| carpet |" in text and "NO" in text
    assert "not in ours: zipper" in text

    # drop the failing category → overall pass
    ok_ours = {k: v for k, v in ours.items() if k != "carpet"}
    _, all_ok2, _ = compare(ok_ours, ref, METRICS, tolerance=0.005)
    assert all_ok2
