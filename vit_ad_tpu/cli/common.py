"""Shared CLI plumbing for the startTraining_* scripts.

Flag surface parity with the reference (reference startTraining_recon.py:40,
startTraining_mdn.py:40, startTraining_NF.py:41):

  -m model  -p patience  -e epochs  -a amountData  -l learnRate
  -w weightDecay  -b batchSize  -d dataPath  -t trainPref  -v validPref
  -i imageSize  --centering
  MDN adds -n numGaussians; NF adds -r hiddenRatio and -f flowSteps.

Dataset/dataclass names are derived from the data path the same way
(reference startTraining_recon.py:128-129), with a fallback for paths that
do not match the expected depth.
"""

from __future__ import annotations

import dataclasses
import getopt
from typing import List, Optional, Tuple

from vit_ad_tpu.config import HyperParams
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.registry import get_possible_models

BTAD_BASE = "data/btad/BTech_Dataset_transformed/01"
MVTEC_BASE = "data/mvtec_anomaly_detection/hazelnut"


def derive_dataset_names(data_path: str) -> Tuple[str, str]:
    """(dataset, dataclass) from the path, reference-style with fallback."""
    parts = [p for p in data_path.split("/") if p]
    try:
        if "btad" in parts:
            i = parts.index("btad")
            return "btad", parts[i + 2] if len(parts) > i + 2 else parts[-1]
        if len(parts) >= 3:
            return parts[1], parts[2]
    except (IndexError, ValueError):
        pass
    return parts[0] if parts else "dataset", parts[-1] if parts else "class"


def parse_args(
    argv: List[str],
    hp: HyperParams,
    data_path: str,
    train_pref: str,
    test_pref: str,
    extra_short: str = "",
    usage_extra: str = "",
) -> Optional[Tuple[HyperParams, str, str, str]]:
    """Parse reference-style flags into (hp, data_path, train_pref,
    test_pref); returns None if -h printed help."""
    # multi-host (pod) runs connect here, before the backend initializes —
    # after this, jax.devices() is the GLOBAL list and --mesh spans hosts
    from vit_ad_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    shortopts = "hm:p:e:a:l:w:b:s:d:i:v:t:" + extra_short
    opts, _ = getopt.getopt(argv, shortopts, ["centering", "mesh="])
    for opt, arg in opts:
        if opt == "-h":
            print(
                "usage: -m <modelType> -p <patience> -e <#epochs> -a <amountOfData>"
                " -l <learnRate> -w <weightDecay> -b <batchSize> -d <dataPath>"
                " -t <trainPref> -i <imageSize> -v <validPref> --centering"
                " --mesh <DxM|auto>"
                + usage_extra
            )
            print(f"Possible model values are: \n {get_possible_models()}")
            return None
        if opt == "--centering":
            hp.centering = True
        elif opt == "--mesh":
            # in-run multi-device training: shard the batch over D devices
            # ("data") and params over M ("model", tensor parallel). New
            # capability vs the reference (SURVEY.md §2.8); see
            # vit_ad_tpu/parallel/. 'auto' = all devices on the data axis.
            from vit_ad_tpu.config import MeshConfig

            hp.mesh = MeshConfig.parse(arg)
        elif opt == "-p":
            hp.patience = int(arg)
        elif opt == "-e":
            hp.epochs = int(arg)
        elif opt == "-a":
            hp.amount_data = int(arg)
        elif opt == "-l":
            hp.learning_rate = float(arg)
        elif opt == "-w":
            hp.weight_decay = float(arg)
        elif opt == "-b":
            hp.batch_size = int(arg)
        elif opt == "-d":
            data_path = arg
        elif opt == "-t":
            train_pref = arg
        elif opt == "-i":
            hp.img_size = int(arg)
        elif opt == "-m":
            hp.model_name = arg.lower()
        elif opt == "-v":
            test_pref = arg
        elif opt == "-n":
            hp.num_gaussians = int(arg)
        elif opt == "-r":
            hp.hidden_ratio = float(arg)
        elif opt == "-f":
            hp.flow_steps = int(arg)
        elif opt == "-s":
            # extension: truncated-encoder depth (the reference hardcodes
            # BLOCK_INDEX_DEIT=0 / edits the constant for its block-7 runs,
            # reference src/pipeline/LearnerNF.py:18; its getopt already
            # accepted an unused "s:")
            hp.block_index = int(arg)
    if hp.block_index and hp.model_name not in ("enc_deit", "enc_vit"):
        # Only the ViT family implements truncated-depth extraction (the
        # reference's BLOCK_INDEX_DEIT trick is DeiT-only, reference
        # src/pipeline/LearnerNF.py:18); other backbones silently ignore
        # block_index — surface that instead of differing silently.
        import warnings

        warnings.warn(
            f"-s {hp.block_index} has no effect on {hp.model_name!r}: block "
            "truncation is implemented for enc_deit/enc_vit only (parity "
            "with the reference's DeiT-only BLOCK_INDEX trick); the full-"
            "depth features will be used",
            stacklevel=2,
        )
    hp.base_path = data_path
    hp.train_pref = train_pref
    hp.dataset, hp.data_class = derive_dataset_names(data_path)
    return hp, data_path, train_pref, test_pref


def build_pipelines(
    hp: HyperParams, data_path: str, train_pref: str, test_pref: str
) -> Tuple[DataPipeline, DataPipeline]:
    data = DataPipeline(
        batch_size=hp.batch_size,
        base_path=data_path,
        data_path=train_pref,
        img_size=hp.img_size,
        amount_data=hp.amount_data if isinstance(hp.amount_data, int) else 0,
    )
    test = DataPipeline(
        batch_size=hp.batch_size,
        base_path=data_path,
        data_path=test_pref,
        img_size=hp.img_size,
        validation_mode=True,
    )
    return data, test


def validate_model_name(hp: HyperParams) -> bool:
    """Reference-style unknown-model handling (reference ModelHelper.py:60-65):
    print the valid keys and signal the caller to abort."""
    names = get_possible_models()
    if hp.model_name not in names:
        print(
            f"Defined model {hp.model_name!r} not known. Please specify one of "
            f"the following model names: \n {names}"
        )
        return False
    return True


def save_loss_curves(logger, history) -> Optional[str]:
    """Save the run's train/valid loss curves into the run dir and register
    the figure with the logger (reference plots loss curves from json,
    src/util/ImageHelper.py:152-222)."""
    if not history.get("train_loss"):
        return None
    from vit_ad_tpu.utils import images as I

    fig = I.plot_loss_curves(history)
    path = f"{logger.dir}/loss_curves.png"
    fig.savefig(path, dpi=100)
    import matplotlib.pyplot as plt

    plt.close(fig)
    logger.log_figure("loss_curves", path)
    return path
