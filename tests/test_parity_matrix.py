"""tools/parity_matrix.py rehearsal: the one-command §6 quality-parity
harness must run end to end on synthetic stand-ins (train → sweep CSVs in
the reference schema → 0.5-pt gate vs a reference-format CSV) so the real
MVTec/BTAD run is a single debugged command the day data lands
(round-3 VERDICT next-step 6)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_parity_matrix_rehearsal(tmp_path):
    import parity_matrix

    out = tmp_path / "parity"
    rc = parity_matrix.main([
        "--rehearse", "--out", str(out),
        # one entry per architecture family, both datasets covered
        "--entries",
        "nf_mvtec_lastblock,gmm_btad_100_gaussians,recon_mvtec_smalldecod",
    ])
    assert rc == 0
    summary = json.loads((out / "parity_summary.json").read_text())
    assert summary["ok"] is True
    assert len(summary["entries"]) == 3
    for e in summary["entries"]:
        assert e["ok"], e
        assert os.path.exists(e["ours"])
        assert os.path.exists(e["ref"])
        # the emitted results.csv is in the reference-joinable schema
        with open(e["ours"]) as f:
            header = f.readline()
        assert "image_auroc_score" in header and "dataclass" in header


def test_matrix_covers_the_section6_headline_csvs():
    """Every BASELINE.md headline per-category table has a matrix entry."""
    import parity_matrix

    names = {e["name"] for e in parity_matrix.MATRIX}
    assert {"nf_mvtec_lastblock", "nf_btad", "gmm_mvtec_100_gaussians",
            "gmm_btad_100_gaussians", "recon_mvtec_resnetdecod",
            "recon_mvtec_smalldecod"} <= names
    for e in parity_matrix.MATRIX:
        assert e["ref_csv"].startswith("csv_results_")
