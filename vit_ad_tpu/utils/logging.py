"""Pluggable metric logging.

The reference logs everything to Weights & Biases (project "masterthesis",
reference src/pipeline/LearnerRecon.py:84-128, src/util/ValidationHelper.py:193-209).
wandb is optional here: the default sink is local JSONL + CSV with the same
metric names, and a wandb sink activates only if the package is importable
and enable_wandb is set.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(
        self,
        log_dir: str,
        run_name: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        enable_wandb: bool = False,
        project: str = "masterthesis",
    ) -> None:
        ts = time.strftime("%Y%m%d-%H%M%S")
        self.run_name = run_name or f"run_{ts}"
        self.dir = os.path.join(log_dir, self.run_name)
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._csv_path = os.path.join(self.dir, "metrics.csv")
        self._csv_keys: list = []
        self._csv_rows: list = []
        self._wandb = None
        if config:
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)
        if enable_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, name=self.run_name, config=config or {}
                )
            except Exception:
                self._wandb = None  # zero-egress / wandb absent: local only

    def log(self, metrics: Dict[str, Any]) -> None:
        record = {"_time": time.time(), **metrics}
        self._jsonl.write(json.dumps(record, default=float) + "\n")
        self._jsonl.flush()
        scalar = {
            k: v for k, v in record.items() if isinstance(v, (int, float, str))
        }
        self._csv_rows.append(scalar)
        new_keys = [k for k in scalar if k not in self._csv_keys]
        if new_keys:
            # header grows (e.g. eval-stage AUROC keys arrive after epoch
            # rows) → rewrite the whole file with the union of keys
            self._csv_keys.extend(new_keys)
            with open(self._csv_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._csv_keys)
                w.writeheader()
                w.writerows(self._csv_rows)
        else:
            with open(self._csv_path, "a", newline="") as f:
                csv.DictWriter(
                    f, fieldnames=self._csv_keys, extrasaction="ignore"
                ).writerow(scalar)
        if self._wandb is not None:
            self._wandb.log(metrics)

    def log_figure(self, name: str, path: str) -> None:
        """Register a saved figure with the wandb run when enabled (reference
        logs eval figures via wandb.log, src/util/ValidationHelper.py:193-209);
        local-only runs already have the file on disk."""
        if self._wandb is not None:
            try:
                import wandb

                self._wandb.log({name: wandb.Image(path)})
            except Exception:
                pass

    def log_artifact(self, path: str) -> None:
        """Attach a file (e.g. a best-weights checkpoint) to the wandb run
        (reference uploads every improved checkpoint,
        src/util/TrainingsHelper.py:112-122)."""
        if self._wandb is not None:
            try:
                import wandb

                wandb.save(path, base_path=os.path.dirname(path))
            except Exception:
                pass

    def finish(self) -> None:
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
