"""CLI for MDN/GMM anomaly-detection training.

Flag parity with reference startTraining_mdn.py (extra flag -n <numGaussians>;
defaults: model deit→enc_deit, patience 100, epochs 1000, lr 7e-4, wd 7e-4,
ng 150, BTAD base — reference startTraining_mdn.py:26-38).
"""

from __future__ import annotations

import os
import sys

from vit_ad_tpu.cli.common import BTAD_BASE, build_pipelines, parse_args
from vit_ad_tpu.config import HyperParams
from vit_ad_tpu.pipeline.train import train_mdn, train_mdn_resnet
from vit_ad_tpu.utils.logging import MetricLogger


def main(argv):
    hp = HyperParams(
        model_name="enc_deit",
        architecture="mdn",
        patience=100,
        epochs=1000,
        learning_rate=7e-4,
        weight_decay=7e-4,
        batch_size=64,
        num_gaussians=150,
        img_size=224,
    )
    parsed = parse_args(
        argv, hp, BTAD_BASE, "train/ok", "test",
        extra_short="n:", usage_extra=" -n <numGaussians>",
    )
    if parsed is None:
        return
    hp, data_path, train_pref, test_pref = parsed
    if not hp.model_name.startswith(("enc_", "ae_")):
        hp.model_name = f"enc_{hp.model_name}"
    from vit_ad_tpu.cli.common import validate_model_name

    if not validate_model_name(hp):
        return None
    data, test = build_pipelines(hp, data_path, train_pref, test_pref)

    print(
        f"Training MDN: model {hp.model_name}, K {hp.num_gaussians}, "
        f"patience {hp.patience}, epochs {hp.epochs}, lr {hp.learning_rate}, "
        f"wd {hp.weight_decay}, bs {hp.batch_size}, img {hp.img_size}, "
        f"data {data_path}/{train_pref}"
    )
    logger = MetricLogger(
        hp.log_dir,
        run_name=f"mdn_{hp.model_name}_{hp.num_gaussians}g_{hp.dataset}_{hp.data_class}",
        config=hp.to_log_dict(),
        enable_wandb=hp.enable_wandb,
    )
    # resnet dispatch parity (reference startTraining_mdn.py:134-147)
    trainer = train_mdn_resnet if "res_net" in hp.model_name else train_mdn
    try:
        result = trainer(hp, data, test, logger=logger,
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
