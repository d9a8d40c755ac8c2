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
    from vit_ad_tpu.config import HyperParams

    hp = HyperParams()
    for k, v in cfg.items():
        if hasattr(hp, k):
            setattr(hp, k, v)
    return hp


def validate_run(run_dir: str, data_root: str, test_pref: str = "test"):
    """Re-evaluate one run directory; returns the metric dict."""
    import jax

    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.pipeline.train import _norm_stats
    from vit_ad_tpu.registry import get_model
    from vit_ad_tpu.utils.checkpoint import load_params

    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = json.load(f)
    hp = _hp_from_config(cfg)
    ckpts = glob.glob(os.path.join(run_dir, "best_params*"))
    if not ckpts:
        raise FileNotFoundError(f"no checkpoint in {run_dir}")
    ckpt = os.path.abspath(ckpts[0])  # orbax requires absolute paths

    base = data_root or hp.base_path
    test = DataPipeline(
        batch_size=hp.batch_size, base_path=base, data_path=test_pref,
        img_size=hp.img_size, validation_mode=True,
    )
    mean, std = None, None
    if not hp.centering:
        from vit_ad_tpu.data.dataset import default_norm_stats

        mean, std = default_norm_stats()

    arch = hp.architecture
    if arch == "mdn":
        from vit_ad_tpu.models.mdn import GaussianMDN
        from vit_ad_tpu.pipeline.eval import evaluate_mdn

        encoder = get_model(hp.model_name, hp.img_size, hp.dtypes)
        from vit_ad_tpu.pipeline.train import default_encoder_params

        enc_params = default_encoder_params(encoder, hp)
        embed_dim = encoder.embed_dim
        mdn = GaussianMDN(features=embed_dim, num_gaussians=hp.num_gaussians)
        target = mdn.init(jax.random.key(0), jnp.zeros((1, 1, embed_dim)))
        head = load_params(ckpt, target)
        return evaluate_mdn(encoder, enc_params, mdn, head, test, hp, mean, std)
    if arch == "nf":
        from vit_ad_tpu.models.flow import NormalizingFlow
        from vit_ad_tpu.pipeline.eval import evaluate_nf

        encoder = get_model(hp.model_name, hp.img_size, hp.dtypes)
        from vit_ad_tpu.pipeline.train import default_encoder_params

        enc_params = default_encoder_params(encoder, hp)
        p = encoder.num_patches
        flow = NormalizingFlow(
            num_channels=encoder.embed_dim, img_size=hp.img_size,
            num_patches=p, hidden_ratio=hp.hidden_ratio,
            flow_steps=hp.flow_steps, dtypes=hp.dtypes,
        )
        side = int(np.sqrt(p))
        target = flow.init(
            jax.random.key(0), jnp.zeros((1, side, side, encoder.embed_dim))
        )
        head = load_params(ckpt, target)
        return evaluate_nf(encoder, enc_params, flow, head, test, hp, mean, std)
    # reconstruction
    from vit_ad_tpu.pipeline.eval import evaluate_recon

    model = get_model(hp.model_name, hp.img_size, hp.dtypes)
    target = model.init(
        jax.random.key(0),
        jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32),
        train=True,
    )
    variables = load_params(ckpt, target)
    return evaluate_recon(model, variables, test, hp, mean, std)


def main(argv):
    runs_dir = "runs"
    data_root = ""
    test_pref = "test"
    opts, _ = getopt.getopt(argv, "hr:d:t:")
    for opt, arg in opts:
        if opt == "-h":
            print("validation_loop.py -r <runsDir> -d <dataRoot> -t <testPref>")
            return
        if opt == "-r":
            runs_dir = arg
        elif opt == "-d":
            data_root = arg
        elif opt == "-t":
            test_pref = arg

    import csv

    rows = []
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
