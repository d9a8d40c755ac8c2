"""MetricLogger: JSONL + growing-header CSV with reference metric names."""

import csv
import json

from vit_ad_tpu.utils.logging import MetricLogger


def test_csv_header_grows_with_eval_keys(tmp_path):
    lg = MetricLogger(str(tmp_path), run_name="r1", config={"a": 1})
    lg.log({"epoch": 0, "train_loss": 1.0, "valid_loss": 2.0})
    lg.log({"epoch": 1, "train_loss": 0.5, "valid_loss": 1.5})
    lg.log({"image_auroc_score": 0.9, "pixel_auroc_score": 0.8, "stage": "eval"})
    lg.finish()

    with open(tmp_path / "r1" / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    assert "image_auroc_score" in rows[0]  # header includes late keys
    assert rows[2]["image_auroc_score"] == "0.9"
    assert rows[0]["train_loss"] == "1.0"

    lines = [json.loads(l) for l in open(tmp_path / "r1" / "metrics.jsonl")]
    assert len(lines) == 3
    assert (tmp_path / "r1" / "config.json").exists()
