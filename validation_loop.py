"""Batch re-evaluation of saved checkpoints — successor of the reference
validation_loop.py (reference validation_loop.py:248-274), which scans saved
.pth weight files and rebuilds model+Validator per file.

Here each training run directory (written by startTraining_*.py /
MetricLogger) carries its config.json and best_params checkpoint; this script
scans a runs directory, rebuilds each model from its config, loads weights,
re-runs the matching validator, and writes a results CSV.
"""

from __future__ import annotations

import getopt
import glob
import json
import os
import sys

import jax.numpy as jnp
import numpy as np


def _hp_from_config(cfg: dict):
    from vit_ad_tpu.pipeline.loading import hp_from_config

    return hp_from_config(cfg)


def validate_run(run_dir: str, data_root: str, test_pref: str = "test"):
    """Re-evaluate one run directory; returns the metric dict."""
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.pipeline.loading import (
        build_run_models,
        evaluate_models,
        find_checkpoint,
        load_run_config,
    )

    hp, cfg = load_run_config(run_dir)
    ckpt = find_checkpoint(run_dir)

    # -d may be a dataset ROOT (join with the run's category) or the
    # category dir itself — prefer the joined path when it exists
    base = data_root or hp.base_path
    joined = os.path.join(base, str(cfg.get("data_class", "")))
    if cfg.get("data_class") and os.path.isdir(os.path.join(joined, test_pref.split("/")[0])):
        base = joined
    test = DataPipeline(
        batch_size=hp.batch_size, base_path=base, data_path=test_pref,
        img_size=hp.img_size, validation_mode=True,
    )
    if hp.centering:
        # reproduce training-time dataset standardization (reference
        # compute_mean_stdev) from the same train split
        train_pipe = DataPipeline(
            batch_size=hp.batch_size, base_path=base,
            data_path=cfg.get("train_pref", "train/good"),
            img_size=hp.img_size,
        )
        mean, std = train_pipe.compute_mean_std()
    else:
        from vit_ad_tpu.data.dataset import default_norm_stats

        mean, std = default_norm_stats()

    models = build_run_models(hp, ckpt)
    return evaluate_models(models, test, mean, std)


def load_encoder_checkpoint(encoder, model_name: str, encoder_ckpt: str,
                            img_size: int, target):
    # compat shim: `encoder` was never used (only the registry name selects
    # the converter) — kept in the signature for existing callers
    from vit_ad_tpu.pipeline.loading import load_encoder_checkpoint as f

    return f(model_name, encoder_ckpt, img_size, target)


def parse_pth_filename(filename: str, arch: str):
    from vit_ad_tpu.pipeline.loading import parse_pth_filename as f

    return f(filename, arch)


def validate_pth(
    pth_path: str,
    model_name: str,
    arch: str,
    data_root: str,
    test_pref: str = "test",
    img_size: int = 224,
    hidden_ratio: float = 0.16,
    flow_steps: int = 20,
    encoder_ckpt: str = "",
    dtypes=None,
):
    """Re-evaluate a reference-format torch `.pth` head checkpoint
    (reference validation_loop.validate_mdn/:35, validate_nf/:161): the
    model rebuild lives in pipeline/loading.build_pth_models; this adds the
    labeled test pipeline + the reference metric suite."""
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.pipeline.loading import build_pth_models, evaluate_models

    models = build_pth_models(
        pth_path, model_name, arch, img_size=img_size,
        hidden_ratio=hidden_ratio, flow_steps=flow_steps,
        encoder_ckpt=encoder_ckpt, dtypes=dtypes,
    )
    hp = models.hp
    base = (
        os.path.join(data_root, hp.data_class) if data_root else hp.data_class
    )
    test = DataPipeline(
        batch_size=hp.batch_size, base_path=base, data_path=test_pref,
        img_size=hp.img_size, validation_mode=True,
    )
    mean, std = default_norm_stats()
    return evaluate_models(models, test, mean, std)


def validate_pth_resnet_mdn(
    pth_stage2: str,
    pth_stage3: str,
    data_root: str,
    test_pref: str = "test",
    img_size: int = 224,
    encoder_ckpt: str = "",
):
    """Re-evaluate the reference's two-file ResNet-MDN legacy checkpoints
    (reference validation_loop.validate_mdn_resnet:87-160): the model
    rebuild lives in pipeline/loading.build_pth_resnet_mdn_models."""
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.pipeline.loading import (
        build_pth_resnet_mdn_models,
        evaluate_models,
    )

    models = build_pth_resnet_mdn_models(
        pth_stage2, pth_stage3, img_size=img_size, encoder_ckpt=encoder_ckpt,
    )
    hp = models.hp
    base = (
        os.path.join(data_root, hp.data_class) if data_root else hp.data_class
    )
    test = DataPipeline(
        batch_size=hp.batch_size, base_path=base, data_path=test_pref,
        img_size=hp.img_size, validation_mode=True,
    )
    mean, std = default_norm_stats()
    return evaluate_models(models, test, mean, std)


def main(argv):
    # multi-host re-evaluation: connect before the backend initializes
    # (no-op unless the VITAD_* cluster env is set)
    from vit_ad_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    runs_dir = "runs"
    data_root = ""
    test_pref = "test"
    model_name = "enc_deit"
    arch = ""
    flow_steps = 20
    hidden_ratio = 0.16
    encoder_ckpt = ""
    opts, _ = getopt.getopt(argv, "hr:d:t:m:a:f:E:")
    for opt, arg in opts:
        if opt == "-h":
            print(
                "validation_loop.py -r <runsDir> -d <dataRoot> -t <testPref>\n"
                "  legacy torch weights: point -r at a directory of reference-"
                "format .pth files and pass -a <mdn|nf|recon> [-m <model>] "
                "[-f <flowSteps>] [-E <encoderCkpt>]\n"
                "  -E: pretrained trunk the heads were trained against "
                "(torch .pth or convert_weights orbax dir); without it legacy "
                "heads evaluate against a random trunk"
            )
            return
        if opt == "-r":
            runs_dir = arg
        elif opt == "-d":
            data_root = arg
        elif opt == "-t":
            test_pref = arg
        elif opt == "-m":
            model_name = arg
        elif opt == "-a":
            arch = arg
        elif opt == "-f":
            flow_steps = int(arg)
        elif opt == "-E":
            encoder_ckpt = arg

    import csv

    rows = []
    pths = sorted(glob.glob(os.path.join(runs_dir, "*.pth")))
    if pths and not arch:
        # don't abort: run-directory re-evaluation below must still happen
        print("found .pth weights — pass -a <mdn|nf|recon> to re-evaluate them too")
        pths = []
    if pths:
        for pth in pths:
            try:
                metrics = validate_pth(
                    pth, model_name, arch, data_root, test_pref,
                    flow_steps=flow_steps, hidden_ratio=hidden_ratio,
                    encoder_ckpt=encoder_ckpt,
                )
                rows.append({"Name": os.path.basename(pth), **metrics})
                print(pth, metrics)
            except Exception as e:
                print(f"{pth}: {type(e).__name__}: {e}")
    for run_dir in sorted(glob.glob(os.path.join(runs_dir, "*"))):
        if not os.path.exists(os.path.join(run_dir, "config.json")):
            continue
        try:
            metrics = validate_run(run_dir, data_root, test_pref)
            rows.append({"Name": os.path.basename(run_dir), **metrics})
            print(run_dir, metrics)
        except Exception as e:
            print(f"{run_dir}: {type(e).__name__}: {e}")
    if rows:
        out = os.path.join(runs_dir, "validation_results.csv")
        keys = sorted({k for r in rows for k in r})
        with open(out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
        print("wrote", out)


if __name__ == "__main__":
    main(sys.argv[1:])
