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
  * category fan-out across chips (`run_sweep_parallel`): independent
    categories dispatch to per-device worker processes (TPU_VISIBLE_DEVICES
    pinning on pods; own single-device backends on CPU), with the same
    done.json resume semantics and identical per-run results.
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


def _effective_hp(base_hp: HyperParams, run: "SweepRun") -> HyperParams:
    hp = dataclasses.replace(base_hp, **run.overrides)
    hp.data_class = run.category
    return hp


def _hp_stamp(hp: HyperParams, run: Optional["SweepRun"] = None) -> str:
    """Stamp of everything that determines a run's result. to_log_dict pops
    'dtypes'/'mesh', and the data location lives on the SweepRun — include
    them explicitly so resuming after a dtype-policy change or against a
    different dataset root re-runs instead of reusing stale done.json rows
    (round-2 ADVICE)."""
    d = hp.to_log_dict()
    d["_dtypes"] = str(hp.dtypes)
    if run is not None:
        d["_data_root"] = run.data_root
        d["_train_pref"] = run.train_pref
        d["_test_pref"] = run.test_pref
    return json.dumps(d, sort_keys=True, default=str)


def _execute_run(
    trainer: Callable,
    base_hp: HyperParams,
    run: SweepRun,
    out_dir: str,
    resume: bool = True,
) -> Dict[str, Any]:
    """One idempotent sweep run: skip if done.json exists, else train,
    crash-isolate, and persist the metric row."""
    run_dir = os.path.join(out_dir, run.name)
    done_path = os.path.join(run_dir, "done.json")
    hp = _effective_hp(base_hp, run)
    hp_stamp = _hp_stamp(hp, run)
    if resume and os.path.exists(done_path):
        with open(done_path) as f:
            row = json.load(f)
        # only reuse a finished run if it was produced with the SAME
        # effective hyper-parameters — base_hp changes (e.g. a different
        # -e/-l on the CLI) must re-run, not silently return stale metrics
        if row.get("_hp") == hp_stamp:
            return row
    os.makedirs(run_dir, exist_ok=True)
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
            "_hp": hp_stamp,
        }
    except Exception as e:  # crash isolation: the sweep continues
        # note: no _hp stamp on error rows — resume retries failed runs
        # instead of skipping them forever, and run_sweep_parallel's
        # collection pass treats them as not-completed
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
    return row


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
        rows.append(_execute_run(trainer, base_hp, run, out_dir, resume))
        _write_csv(os.path.join(out_dir, "results.csv"), rows)
    return rows


TRAINERS = {
    "nf": "train_nf",
    "mdn": "train_mdn",
    "recon": "train_recon",
    "vae": "train_vae",
    "mdn_resnet": "train_mdn_resnet",
    "nf_resnet": "train_nf_resnet",
}


def resolve_trainer(arch: str) -> Callable:
    import vit_ad_tpu.pipeline.train as T

    return getattr(T, TRAINERS[arch])


def _worker_main(arch, base_hp, runs, out_dir, resume, worker_idx):
    """Subprocess body for one fan-out worker: pin this process to its
    device, then execute its slice of runs. Spawned with a per-worker
    environment (set by run_sweep_parallel before fork):

      * CPU / virtual mesh  — JAX_PLATFORMS=cpu; each worker process owns its
        own single-device CPU backend (the axon plugin overrides
        JAX_PLATFORMS at import, so re-force via jax.config)
      * TPU pod             — TPU_VISIBLE_DEVICES=<chip> pins one chip per
        process, the standard JAX multi-process-per-host pattern
    """
    import os

    if os.environ.get("VITAD_SWEEP_PLATFORM") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    trainer = resolve_trainer(arch)
    for run in runs:
        row = _execute_run(trainer, base_hp, run, out_dir, resume)
        print(f"[worker {worker_idx}] {run.name}: "
              f"{row.get('image_auroc_score', row.get('error', '?'))}")


def run_sweep_parallel(
    arch: str,
    base_hp: HyperParams,
    runs: Sequence[SweepRun],
    out_dir: str,
    num_workers: int,
    resume: bool = True,
    platform: Optional[str] = None,
) -> List[Dict[str, Any]]:
    """Fan independent category runs out across devices — the reference's
    sweep is strictly sequential (reference trainings_loop.py:146-190); per
    -category training is embarrassingly parallel, so N chips train N
    categories concurrently.

    One subprocess per worker, each pinned to its own device GROUP: with the
    default single-device hp.mesh, worker i sees only chip i
    (TPU_VISIBLE_DEVICES); with `--mesh DxM` each worker sees a disjoint
    group of D*M chips and every run inside it trains mesh-sharded — the two
    parallelism axes compose (e.g. 8 chips = `-j 4 --mesh 2x1`: four
    categories in flight, each DP-sharded over two chips). On CPU each
    worker is its own backend with D*M virtual devices. Work splits
    round-robin; done.json makes re-entry resume exactly like the sequential
    path, and rows are collected from done.json files so results are
    byte-identical either way."""
    import multiprocessing as mp

    os.makedirs(out_dir, exist_ok=True)
    if platform is None:
        platform = "cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else "tpu"

    n_dev = 1
    if base_hp.mesh.requested:
        if base_hp.mesh.data < 1 or base_hp.mesh.model < 1:
            raise ValueError(
                "sweep workers need explicit mesh sizes (DxM); -1 ('all "
                "devices') is ambiguous when the sweep is also fanning out"
            )
        n_dev = base_hp.mesh.data * base_hp.mesh.model

    ctx = mp.get_context("spawn")
    procs = []
    saved_env = dict(os.environ)
    try:
        for i in range(num_workers):
            slice_i = list(runs[i::num_workers])
            if not slice_i:
                continue
            # env is inherited at spawn — set per-worker pinning, then restore
            if platform == "cpu":
                os.environ["VITAD_SWEEP_PLATFORM"] = "cpu"
                os.environ["JAX_PLATFORMS"] = "cpu"
                # D*M virtual devices per worker (1 without a mesh: the
                # parallelism is across processes)
                os.environ["XLA_FLAGS"] = (
                    f"--xla_force_host_platform_device_count={n_dev}"
                )
            else:
                os.environ["TPU_VISIBLE_DEVICES"] = ",".join(
                    str(i * n_dev + j) for j in range(n_dev)
                )
            p = ctx.Process(
                target=_worker_main,
                args=(arch, base_hp, slice_i, out_dir, resume, i),
            )
            p.start()
            procs.append(p)
    finally:
        os.environ.clear()
        os.environ.update(saved_env)

    failed = []
    for p in procs:
        p.join()
        if p.exitcode != 0:
            failed.append(p)

    rows: List[Dict[str, Any]] = []
    for run in runs:
        done_path = os.path.join(out_dir, run.name, "done.json")
        if os.path.exists(done_path):
            with open(done_path) as f:
                row = json.load(f)
            # same stamp check as _execute_run: a crashed worker must not
            # surface stale rows from an older sweep with different settings
            if row.get("_hp") == _hp_stamp(_effective_hp(base_hp, run), run):
                rows.append(row)
    _write_csv(os.path.join(out_dir, "results.csv"), rows)
    if failed:
        raise RuntimeError(
            f"{len(failed)} sweep workers died; completed {len(rows)}/"
            f"{len(runs)} runs (re-run to resume the rest)"
        )
    return rows


def _write_csv(path: str, rows: List[Dict[str, Any]]) -> None:
    keys: List[str] = []
    for r in rows:
        for k in r:
            if k not in keys and not k.startswith("_"):
                keys.append(k)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
        w.writeheader()
        w.writerows(rows)
