"""CLI for normalizing-flow anomaly-detection training.

Flag parity with reference startTraining_NF.py (extra flags -r <hiddenRatio>
-f <flowSteps>; defaults: enc_deit, patience 60, epochs 500, lr 1e-3,
wd 1e-5, bs 32, hidden_ratio 0.16, flow_steps 20 — reference
startTraining_NF.py:26-39).
"""

from __future__ import annotations

import os
import sys

from vit_ad_tpu.cli.common import MVTEC_BASE, build_pipelines, parse_args
from vit_ad_tpu.config import HyperParams
from vit_ad_tpu.pipeline.train import train_nf, train_nf_resnet
from vit_ad_tpu.utils.logging import MetricLogger


def main(argv):
    hp = HyperParams(
        model_name="enc_deit",
        architecture="nf",
        patience=60,
        epochs=500,
        learning_rate=1e-3,
        weight_decay=1e-5,
        batch_size=32,
        hidden_ratio=0.16,
        flow_steps=20,
        img_size=224,
    )
    parsed = parse_args(
        argv, hp, MVTEC_BASE, "train/good", "test",
        extra_short="r:f:", usage_extra=" -r <hiddenRatio> -f <flowSteps>",
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
        f"Training NF: model {hp.model_name}, hidden_ratio {hp.hidden_ratio}, "
        f"flow_steps {hp.flow_steps}, patience {hp.patience}, epochs {hp.epochs}, "
        f"lr {hp.learning_rate}, wd {hp.weight_decay}, bs {hp.batch_size}, "
        f"img {hp.img_size}, data {data_path}/{train_pref}"
    )
    logger = MetricLogger(
        hp.log_dir,
        run_name=f"nf_{hp.model_name}_{hp.dataset}_{hp.data_class}",
        config=hp.to_log_dict(),
        enable_wandb=hp.enable_wandb,
    )
    # resnet dispatch parity (reference startTraining_NF.py:139-152)
    trainer = train_nf_resnet if "res_net" in hp.model_name else train_nf
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
