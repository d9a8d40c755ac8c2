"""Per-epoch wall decomposition for any product trainer.

Generalizes tools/probe_mdn_epoch.py: runs a REAL trainer (synthetic
category) with a MetricLogger and prints, per epoch, the train window
(from run_epochs' images_per_sec log) vs total epoch time
(history.epoch_time: train + valid + snapshot + stopper), splitting
"train dispatch" from "everything else". Use --no-retain to A/B the
best-weight retention copy, --scan 0/1 to force the epoch mode, and
VITAD_TRACE=<dir> to capture epoch 1's device trace (decode with
tools/profile_trace.parse_xplane).

    python tools/probe_epoch.py --which recon --epochs 8 --n-train 96

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

TRAINER_SPECS = {
    # which -> (trainer attr, architecture, model_name)
    "mdn": ("train_mdn", "mdn", "enc_deit"),
    "nf": ("train_nf", "nf", "enc_deit"),
    "recon": ("train_recon", "reconstruction", "ae_deit"),
    "vae": ("train_vae", "reconstruction", "ae_cnn"),
    "mdn_resnet": ("train_mdn_resnet", "mdn", "enc_res_net"),
    "nf_resnet": ("train_nf_resnet", "nf", "enc_res_net"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="mdn", choices=sorted(TRAINER_SPECS))
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-train", type=int, default=160)
    ap.add_argument("--gaussians", type=int, default=100)
    ap.add_argument("--flow-steps", type=int, default=20)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--scan", default="1", choices=("0", "1"))
    ap.add_argument("--no-retain", action="store_true",
                    help="A/B: skip the best-weight retention copy")
    args = ap.parse_args()

    os.environ["VITAD_SCAN_EPOCH"] = args.scan
    if args.no_retain:
        from vit_ad_tpu.pipeline import early_stopping as _es

        # MEASUREMENT-ONLY: identity aliases live buffers that the next
        # donated train step deletes — best_params becomes unreadable.
        # That is the point (zero-copy A/B); this probe never consumes the
        # result weights (test_data=None, no checkpoint). Never copy this
        # patch into product code; a "cheap retention" would be
        # host_snapshot, which re-adds the fetch the A/B isolates.
        _es.retain_snapshot = lambda tree: tree

    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.pipeline import train as T
    from vit_ad_tpu.utils.logging import MetricLogger

    attr, arch, model_name = TRAINER_SPECS[args.which]
    root = tempfile.mkdtemp(prefix=f"probe_{args.which}_")
    make_mvtec_category(root, "probe", img_size=args.img_size,
                        n_train=args.n_train, n_test_good=2, n_test_defect=2)
    hp = HyperParams(
        model_name=model_name, architecture=arch, batch_size=args.batch,
        img_size=args.img_size, num_gaussians=args.gaussians,
        flow_steps=args.flow_steps, hidden_ratio=0.16, learning_rate=1e-3,
        weight_decay=1e-5, seed=24, epochs=args.epochs, patience=args.epochs,
    )
    data = DataPipeline(batch_size=args.batch, base_path=root,
                        data_path="train/good", img_size=args.img_size)
    logdir = tempfile.mkdtemp(prefix=f"probe_{args.which}_log_")
    logger = MetricLogger(logdir, run_name="probe")
    t0 = time.perf_counter()
    result = getattr(T, attr)(hp, data, None, logger=logger)
    wall = time.perf_counter() - t0
    logger.finish()

    hist = result.history
    rows = []
    with open(os.path.join(logdir, "probe", "metrics.jsonl")) as fh:
        for line in fh:
            rows.append(json.loads(line))
    # run_epochs logs images_per_sec = n_items / t_train; recover each
    # epoch's train window (split rounds: data/files.py)
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
        "which": args.which,
        "scan": args.scan,
        "no_retain": args.no_retain,
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
