"""Decompose the MDN product-trainer epoch floor on hardware.

tools/epoch_bench.json (post device-side retention) has MDN-100 at
~2.4 s/epoch scanned, but the step bound (tools/train_bench.json, 759
img/s B=32) prices a 128-image train epoch at ~0.21 s — ~2 s/epoch is
unexplained. This probe runs the REAL `train_mdn` (synthetic category,
n=160, B=32, no early stop) with a MetricLogger and prints, per epoch:

  - the train window (run_epochs logs images_per_sec over t_train),
  - total epoch time (history.epoch_time: train + valid + snapshot),

which splits "train scan dispatch" from "valid + retention + stopper".
Optionally set VITAD_TRACE=<dir> to also capture epoch 1's device trace
(decode with tools/profile_trace.py).

axon rules (PERF.md): run to completion, one TPU process at a time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-train", type=int, default=160)
    ap.add_argument("--gaussians", type=int, default=100)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--scan", default="1", choices=("0", "1"))
    ap.add_argument("--no-retain", action="store_true",
                    help="A/B: skip the best-weight retention copy so the "
                         "rest bucket splits into retention vs valid+update")
    args = ap.parse_args()

    os.environ["VITAD_SCAN_EPOCH"] = args.scan
    if args.no_retain:
        from vit_ad_tpu.pipeline import early_stopping as _es

        # MEASUREMENT-ONLY zero-copy alias; the donated next step deletes
        # these buffers, so best_params is unreadable afterwards — fine
        # here (no eval, no checkpoint). See tools/probe_epoch.py.
        _es.retain_snapshot = lambda tree: tree

    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.pipeline.train import train_mdn
    from vit_ad_tpu.utils.logging import MetricLogger

    root = tempfile.mkdtemp(prefix="probe_mdn_")
    make_mvtec_category(root, "probe", img_size=args.img_size, n_train=args.n_train,
                        n_test_good=2, n_test_defect=2)
    hp = HyperParams(
        model_name="enc_deit", architecture="mdn", batch_size=args.batch,
        img_size=args.img_size, num_gaussians=args.gaussians, learning_rate=1e-3,
        weight_decay=1e-5, seed=24, epochs=args.epochs, patience=args.epochs,
    )
    data = DataPipeline(batch_size=args.batch, base_path=root,
                        data_path="train/good", img_size=args.img_size)
    logdir = tempfile.mkdtemp(prefix="probe_mdn_log_")
    logger = MetricLogger(logdir, run_name="probe")
    t0 = time.perf_counter()
    result = train_mdn(hp, data, None, logger=logger)
    wall = time.perf_counter() - t0
    logger.finish()

    hist = result.history
    rows = []
    with open(os.path.join(logdir, "probe", "metrics.jsonl")) as fh:
        for line in fh:
            rows.append(json.loads(line))
    # run_epochs logs images_per_sec = n_items / t_train per epoch; the
    # train-item count is constant, so recover each epoch's train window
    # from it. The split rounds (data/files.py), matching int() only when
    # n_train * 0.8 is integral.
    n_items = round(args.n_train * 0.8)
    per_epoch = []
    for i, et in enumerate(hist["epoch_time"]):
        row = next((r for r in rows if r.get("epoch") == i), {})
        ips = float(row.get("images_per_sec", 0.0))
        t_train = n_items / ips if ips else float("nan")
        per_epoch.append({
            "epoch": i,
            "epoch_time_s": round(et, 3),
            "train_window_s": round(t_train, 3),
            "rest_s": round(et - t_train, 3),
        })
    print(json.dumps({
        "scan": args.scan,
        "total_wall_s": round(wall, 2),
        "train_images_per_sec": hist.get("train_images_per_sec"),
        "per_epoch": per_epoch,
    }, indent=1))
    steady = per_epoch[2:]
    if steady:
        def _mean(key):
            vals = [r[key] for r in steady if r[key] == r[key]]
            return round(sum(vals) / max(len(vals), 1), 3)
        print(json.dumps({
            "steady_mean_epoch_s": _mean("epoch_time_s"),
            "steady_mean_train_window_s": _mean("train_window_s"),
            "steady_mean_rest_s": _mean("rest_s"),
        }))


if __name__ == "__main__":
    main()
