"""Batch sweep driver — successor of the reference trainings_loop.py
(reference trainings_loop.py:91-190).

Runs per-category training across MVTec/BTAD with the sweep engine
(idempotent runs, crash isolation, CSV output comparable to the reference's
csv_results_* exports). Edit the CONFIG block or pass --data/--arch.
"""

from __future__ import annotations

import getopt
import os
import sys

from vit_ad_tpu.config import HyperParams
from vit_ad_tpu.pipeline.sweep import (
    BTAD_CATEGORIES,
    MVTEC_CATEGORIES,
    SweepRun,
    run_sweep,
)


def main(argv):
    arch = "nf"
    data_root = "data/mvtec_anomaly_detection"
    out_dir = "sweep_results"
    model = "enc_deit"
    categories = None
    workers = 1

    mesh_spec = None
    overrides = {}
    opts, _ = getopt.getopt(argv, "ha:d:o:m:c:e:b:i:p:n:l:w:j:", ["mesh="])
    for opt, arg in opts:
        if opt == "-h":
            print("trainings_loop.py -a <arch: nf|mdn|recon> -d <dataRoot> "
                  "-o <outDir> -m <model> -c <cat1,cat2,...> "
                  "[-e epochs -b batch -i imgSize -p patience -n gaussians "
                  "-l lr -w wd -j workers --mesh DxM]\n"
                  "  -j N > 1 fans categories out across N device groups "
                  "(one pinned worker process per group); --mesh DxM makes "
                  "each group D*M chips and every run inside it trains "
                  "mesh-sharded (e.g. 8 chips: -j 4 --mesh 2x1)")
            return
        if opt == "-a":
            arch = arg
        elif opt == "-d":
            data_root = arg
        elif opt == "-o":
            out_dir = arg
        elif opt == "-m":
            model = arg
        elif opt == "-c":
            categories = arg.split(",")
        elif opt == "-e":
            overrides["epochs"] = int(arg)
        elif opt == "-b":
            overrides["batch_size"] = int(arg)
        elif opt == "-i":
            overrides["img_size"] = int(arg)
        elif opt == "-p":
            overrides["patience"] = int(arg)
        elif opt == "-n":
            overrides["num_gaussians"] = int(arg)
        elif opt == "-l":
            overrides["learning_rate"] = float(arg)
        elif opt == "-w":
            overrides["weight_decay"] = float(arg)
        elif opt == "-j":
            workers = int(arg)
        elif opt == "--mesh":
            mesh_spec = arg

    is_btad = "btad" in data_root
    if categories is None:
        categories = list(BTAD_CATEGORIES if is_btad else MVTEC_CATEGORIES)
    train_pref = "train/ok" if is_btad else "train/good"

    if arch == "nf":
        hp = HyperParams(model_name=model, architecture="nf", epochs=500,
                         patience=60, learning_rate=1e-3, weight_decay=1e-5,
                         batch_size=32, hidden_ratio=0.16, flow_steps=20)
    elif arch == "mdn":
        hp = HyperParams(model_name=model, architecture="mdn", epochs=1000,
                         patience=100, learning_rate=7e-4, weight_decay=7e-4,
                         batch_size=64, num_gaussians=100)
    elif arch == "recon":
        hp = HyperParams(model_name=model if model.startswith("ae_") else "ae_deit",
                         architecture="reconstruction", epochs=50, patience=30,
                         learning_rate=1e-3, weight_decay=1e-4, batch_size=64)
    else:
        raise SystemExit(f"unknown arch {arch!r}")

    import dataclasses

    # resnet multi-stage dispatch parity (reference startTraining_*:134-152)
    if "res_net" in model and arch in ("mdn", "nf"):
        arch = f"{arch}_resnet"

    hp = dataclasses.replace(hp, **overrides)
    if mesh_spec:
        from vit_ad_tpu.config import MeshConfig

        hp = dataclasses.replace(hp, mesh=MeshConfig.parse(mesh_spec))
    runs = [
        SweepRun(category=c, data_root=data_root, train_pref=train_pref)
        for c in categories
    ]
    if workers > 1:
        from vit_ad_tpu.pipeline.sweep import run_sweep_parallel

        rows = run_sweep_parallel(arch, hp, runs, out_dir, workers)
    else:
        from vit_ad_tpu.pipeline.sweep import resolve_trainer

        rows = run_sweep(resolve_trainer(arch), hp, runs, out_dir)
    ok = [r for r in rows if "image_auroc_score" in r]
    if ok:
        mean = sum(r["image_auroc_score"] for r in ok) / len(ok)
        print(f"mean image AUROC over {len(ok)} categories: {mean:.4f}")
    # per-category training-image counts, reference ImageHelper's dataset
    # distribution plot (src/util/ImageHelper.py:225-306)
    try:
        from vit_ad_tpu.data.files import join_to_file_list
        from vit_ad_tpu.utils import images as I

        counts = {
            c: len(join_to_file_list(
                os.path.join(data_root, c), train_pref, shuffle=False))
            for c in categories
        }
        fig = I.plot_dataset_distribution(counts, title=f"{arch} sweep data")
        fig.savefig(os.path.join(out_dir, "dataset_distribution.png"), dpi=100)
        import matplotlib.pyplot as plt

        plt.close(fig)
    except Exception as e:  # plotting must never fail the sweep
        print(f"distribution plot skipped: {type(e).__name__}: {e}")
    print(f"results: {out_dir}/results.csv")


if __name__ == "__main__":
    main(sys.argv[1:])
