"""tools/compare_results.py — joining our sweep CSV against the reference's
wandb-export baselines (BASELINE.md acceptance check)."""

import csv
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import compare_results as cr  # noqa: E402

REF_HEADER = [
    "Name", "State", "Tags", "architecture", "encoder", "dataclass",
    "dataset", "image_auroc_score", "pixel_auroc_score",
]


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=header)
        w.writeheader()
        w.writerows(rows)


def _ref_csv(tmp_path):
    """Two categories; bottle has both a training row (worse) and an Eval row
    (the one BASELINE.md reads); tile has eval rows for two backbones."""
    path = str(tmp_path / "ref.csv")
    _write_csv(path, REF_HEADER, [
        {"Name": "EncoderDeit_NF-2023", "dataclass": "bottle",
         "dataset": "mvtec", "architecture": "EncoderDeit_NormalizingFlow",
         "image_auroc_score": "0.90", "pixel_auroc_score": "0.80"},
        {"Name": "Eval-nf-on-mvtec_bottle", "dataclass": "bottle",
         "dataset": "mvtec", "architecture": "EncoderDeit_NormalizingFlow",
         "image_auroc_score": "0.9984", "pixel_auroc_score": "0.8641"},
        {"Name": "Eval-gmm-on-mvtec_tile", "dataclass": "tile",
         "dataset": "mvtec", "architecture": "EncoderEsVit_GMM",
         "image_auroc_score": "0.9931", "pixel_auroc_score": "0.6428"},
        {"Name": "Eval-gmm-on-mvtec_tile", "dataclass": "tile",
         "dataset": "mvtec", "architecture": "EncoderNest_GMM",
         "image_auroc_score": "0.6728", "pixel_auroc_score": "0.5060"},
    ])
    return path


def _ours_csv(tmp_path, bottle=0.9984, tile=0.9940):
    path = str(tmp_path / "results.csv")
    _write_csv(
        path,
        ["Name", "dataclass", "model", "image_auroc_score",
         "pixel_auroc_score", "error"],
        [
            {"Name": "nf_bottle", "dataclass": "bottle", "model": "enc_deit",
             "image_auroc_score": str(bottle), "pixel_auroc_score": "0.88"},
            {"Name": "nf_tile", "dataclass": "tile", "model": "enc_esvit",
             "image_auroc_score": str(tile), "pixel_auroc_score": "0.65"},
            {"Name": "nf_crash", "dataclass": "wood", "model": "enc_deit",
             "image_auroc_score": "", "pixel_auroc_score": "",
             "error": "ValueError: boom"},
        ],
    )
    return path


def test_eval_rows_win_and_within_tolerance_passes(tmp_path, capsys):
    rc = cr.main([
        "--ours", _ours_csv(tmp_path), "--ref", _ref_csv(tmp_path),
        "--metrics", "image_auroc_score",
    ])
    out = capsys.readouterr().out
    # bottle must compare against the Eval row (0.9984), not the training row
    assert "0.9984 / 0.9984 / +0.0000" in out
    assert rc == 0


def test_encoder_filter_selects_backbone_row(tmp_path):
    ref = cr.load_reference(
        _ref_csv(tmp_path), ["image_auroc_score"], encoder="Nest"
    )
    assert ref == {"tile": {"image_auroc_score": 0.6728}}


def test_shortfall_beyond_tolerance_fails(tmp_path, capsys):
    rc = cr.main([
        "--ours", _ours_csv(tmp_path, bottle=0.9800),
        "--ref", _ref_csv(tmp_path), "--metrics", "image_auroc_score",
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "NO" in out


def test_beating_reference_never_fails(tmp_path):
    # without --encoder, the LAST eval row per category wins (Nest 0.6728);
    # ours at 0.9940 beats it by far — must pass
    rc = cr.main([
        "--ours", _ours_csv(tmp_path), "--ref", _ref_csv(tmp_path),
        "--metrics", "image_auroc_score",
    ])
    assert rc == 0


def test_error_rows_and_dataset_names_excluded(tmp_path):
    ours = cr.load_ours(_ours_csv(tmp_path), ["image_auroc_score"])
    assert "wood" not in ours  # crashed run
    assert set(ours) == {"bottle", "tile"}
    # `dataset` holding a dataset NAME is never mistaken for a category
    assert cr._category({"dataclass": "", "dataset": "mvtec"}) == ""


REAL_REF = "/root/reference/csv_results_nf/nf_mvtec_lastblock.csv"


@pytest.mark.skipif(not os.path.exists(REAL_REF), reason="reference absent")
def test_parses_real_reference_export():
    ref = cr.load_reference(
        REAL_REF, ["image_auroc_score", "pixel_auroc_score"]
    )
    # 15 MVTec categories, all from Eval rows, bottle matching BASELINE.md
    assert len(ref) == 15
    assert abs(ref["bottle"]["image_auroc_score"] - 0.9984) < 1e-3
    assert abs(ref["bottle"]["pixel_auroc_score"] - 0.8641) < 1e-3
