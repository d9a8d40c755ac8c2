"""Sweep engine: categories × models × hyper-parameters.

Replaces the reference's trainings_loop.py / validation_loop.py pattern
(reference trainings_loop.py:91-190 — nested for-loops mutating a shared argv
list, fully sequential, no crash recovery) with a declarative runner:

  * each run is a (category, model, overrides) triple
  * runs are idempotent/resumable — a finished run writes
    `<out>/<run>/done.json` and is skipped on re-entry (SURVEY.md §5
    failure-detection gap)
  * results accumulate into one CSV with the reference's metric names, so
    the output is directly comparable to csv_results_*
  * category fan-out across chips: with a multi-device mesh, independent
    categories can be dispatched per device (data axis) since per-category
    training is embarrassingly parallel.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
import traceback
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

from vit_ad_tpu.config import HyperParams
from vit_ad_tpu.data.loader import DataPipeline

MVTEC_CATEGORIES = (
    "bottle", "cable", "capsule", "carpet", "grid", "hazelnut", "leather",
    "metal_nut", "pill", "screw", "tile", "toothbrush", "transistor",
    "wood", "zipper",
)
BTAD_CATEGORIES = ("01", "02", "03")


@dataclasses.dataclass
class SweepRun:
    category: str
    data_root: str           # e.g. data/mvtec_anomaly_detection
    train_pref: str = "train/good"
    test_pref: str = "test"
    overrides: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def name(self) -> str:
        parts = [self.category] + [
            f"{k}={v}" for k, v in sorted(self.overrides.items())
        ]
        return "_".join(str(p) for p in parts)


def run_sweep(
    trainer: Callable,
    base_hp: HyperParams,
    runs: Sequence[SweepRun],
    out_dir: str,
    resume: bool = True,
) -> List[Dict[str, Any]]:
    """Execute runs sequentially (per-chip); returns collected metric rows and
    writes `<out_dir>/results.csv`."""
    os.makedirs(out_dir, exist_ok=True)
    rows: List[Dict[str, Any]] = []
    for run in runs:
        run_dir = os.path.join(out_dir, run.name)
        done_path = os.path.join(run_dir, "done.json")
        if resume and os.path.exists(done_path):
            with open(done_path) as f:
                rows.append(json.load(f))
            continue
        os.makedirs(run_dir, exist_ok=True)
        hp = dataclasses.replace(base_hp, **run.overrides)
        hp.data_class = run.category
        base = os.path.join(run.data_root, run.category)
        try:
            data = DataPipeline(
                batch_size=hp.batch_size, base_path=base,
                data_path=run.train_pref, img_size=hp.img_size,
                amount_data=hp.amount_data,
            )
            test = DataPipeline(
                batch_size=hp.batch_size, base_path=base,
                data_path=run.test_pref, img_size=hp.img_size,
                validation_mode=True,
            )
            result = trainer(hp, data, test)
            row = {
                "Name": run.name,
                "dataclass": run.category,
                "model": hp.model_name,
                "epochs_ran": result.epochs_ran,
                "best_valid_loss": result.best_valid_loss,
                **result.metrics,
            }
        except Exception as e:  # crash isolation: the sweep continues
            row = {
                "Name": run.name,
                "dataclass": run.category,
                "model": hp.model_name,
                "error": f"{type(e).__name__}: {e}",
            }
            with open(os.path.join(run_dir, "traceback.txt"), "w") as f:
                f.write(traceback.format_exc())
        with open(done_path, "w") as f:
            json.dump(row, f, default=float)
        rows.append(row)
        _write_csv(os.path.join(out_dir, "results.csv"), rows)
    return rows


def _write_csv(path: str, rows: List[Dict[str, Any]]) -> None:
    keys: List[str] = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
        w.writeheader()
        w.writerows(rows)
