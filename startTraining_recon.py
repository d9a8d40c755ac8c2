"""CLI for reconstruction (auto-encoder) anomaly-detection training.

Flag-for-flag parity with the reference startTraining_recon.py (defaults:
model ae_cnn, patience 30, epochs 50, lr 1e-3, wd 1e-4, bs 64, img 224 —
reference startTraining_recon.py:27-38).
"""

from __future__ import annotations

import os
import sys

from vit_ad_tpu.cli.common import MVTEC_BASE, build_pipelines, parse_args
from vit_ad_tpu.config import HyperParams
from vit_ad_tpu.pipeline.train import train_recon
from vit_ad_tpu.utils.logging import MetricLogger


def main(argv):
    hp = HyperParams(
        model_name="ae_cnn",
        architecture="reconstruction",
        patience=30,
        epochs=50,
        learning_rate=1e-3,
        weight_decay=1e-4,
        batch_size=64,
        img_size=224,
    )
    parsed = parse_args(argv, hp, MVTEC_BASE, "train/good", "test")
    if parsed is None:
        return
    hp, data_path, train_pref, test_pref = parsed
    from vit_ad_tpu.cli.common import validate_model_name

    if not validate_model_name(hp):
        return None
    data, test = build_pipelines(hp, data_path, train_pref, test_pref)

    print(
        f"Training recon: model {hp.model_name}, patience {hp.patience}, "
        f"epochs {hp.epochs}, lr {hp.learning_rate}, wd {hp.weight_decay}, "
        f"bs {hp.batch_size}, img {hp.img_size}, data {data_path}/{train_pref}"
    )
    logger = MetricLogger(
        hp.log_dir,
        run_name=f"recon_{hp.model_name}_{hp.dataset}_{hp.data_class}",
        config=hp.to_log_dict(),
        enable_wandb=hp.enable_wandb,
    )
    try:
        result = train_recon(hp, data, test, logger=logger,
                         figures_dir=os.path.join(logger.dir, "figures"))
        print("final metrics:", result.metrics)
        from vit_ad_tpu.cli.common import save_loss_curves

        save_loss_curves(logger, result.history)
        from vit_ad_tpu.utils.checkpoint import save_params

        ckpt = save_params(logger.dir, "best_params", result.head_params)
        logger.log_artifact(ckpt)
        print("checkpoint:", ckpt)
        return result
    finally:
        logger.finish()


if __name__ == "__main__":
    main(sys.argv[1:])
