"""CLI surface: reference-compatible flags drive real training in-process
(the way the reference's trainings_loop.py calls the mains,
reference trainings_loop.py:146-190)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo root (startTraining_* live there)


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    from vit_ad_tpu.data.synthetic import make_mvtec_category

    root = tmp_path_factory.mktemp("mvtec_cli")
    make_mvtec_category(
        str(root), "cat", img_size=32, n_train=16, n_test_good=4, n_test_defect=4
    )
    return f"{root}/cat"


def test_mdn_cli(category, tmp_path, monkeypatch):
    import startTraining_mdn

    monkeypatch.chdir(tmp_path)
    result = startTraining_mdn.main(
        [
            "-m", "enc_deit", "-n", "3", "-e", "3", "-p", "2", "-b", "8",
            "-i", "32", "-l", "3e-3", "-d", category, "-t", "train/good",
            "-v", "test",
        ]
    )
    assert result is not None
    assert np.isfinite(result.metrics["image_auroc_score"])
    # logger artifacts with reference metric names
    import glob, json

    files = glob.glob(str(tmp_path / "runs/*/metrics.jsonl"))
    assert files
    lines = [json.loads(l) for l in open(files[0])]
    eval_rows = [l for l in lines if l.get("stage") == "eval"]
    assert eval_rows and "image_auroc_score" in eval_rows[0]


def test_nf_cli(category, tmp_path, monkeypatch):
    import startTraining_NF

    monkeypatch.chdir(tmp_path)
    result = startTraining_NF.main(
        [
            "-m", "deit", "-e", "3", "-p", "2", "-b", "8", "-i", "32",
            "-r", "1.0", "-f", "2", "-d", category, "-t", "train/good",
            "-v", "test",
        ]
    )
    assert result is not None
    assert np.isfinite(result.metrics["image_auroc_score"])


def test_recon_cli_help(capsys):
    import startTraining_recon

    assert startTraining_recon.main(["-h"]) is None
    out = capsys.readouterr().out
    assert "-m <modelType>" in out and "ae_cnn" in out
