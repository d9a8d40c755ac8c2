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
    """Resolve an encoder checkpoint for legacy-.pth re-evaluation.

    The reference evaluates its heads against ImageNet/EsViT-pretrained
    trunks downloaded at model build (reference CnnEncoder.py:140-145,
    TransformerEncoder.py:57,134); without pretrained trunk weights a
    re-evaluated reference head is meaningless. Accepts either
      * a torch ``.pth`` in the upstream layout (timm / torchvision / EsViT
        release) — converted through the strict converter for the model, or
      * an orbax checkpoint directory written by
        ``python -m vit_ad_tpu.cli.convert_weights``.
    """
    from vit_ad_tpu.utils import torch_convert as tc

    if encoder_ckpt.endswith(".pth"):
        from vit_ad_tpu.cli.convert_weights import MODEL_ARCH, convert_state_dict

        if model_name not in MODEL_ARCH:
            raise ValueError(
                f"no torch converter registered for {model_name!r}; "
                f"known: {sorted(MODEL_ARCH)}"
            )
        sd = tc.strip_prefix(tc.load_pth(encoder_ckpt), "module.")
        _, converted = convert_state_dict(MODEL_ARCH[model_name], sd, img_size)
        return tc.merge_variables(target, converted)
    from vit_ad_tpu.utils.checkpoint import load_params

    return load_params(os.path.abspath(encoder_ckpt), target)


def parse_pth_filename(filename: str, arch: str):
    """Reference filename convention (reference validation_loop.py:38-41,
    92-95,163-166,212-215): MDN files lead with the gaussian count, every
    file ends with the data class; 'nut'/'metal' tails mean metal_nut.
    Returns (num_gaussians | None, dataclass)."""
    stem = os.path.basename(filename)
    stem = stem[:-4] if stem.endswith(".pth") else stem
    dataclass = stem.split("_")[-1]
    if dataclass in ("nut", "metal"):
        dataclass = "metal_nut"
    num_gaussians = None
    if arch == "mdn":
        num_gaussians = int(stem.split("_")[0])
    return num_gaussians, dataclass


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
    (reference validation_loop.validate_mdn/:35, validate_nf/:161): parse
    num_gaussians/dataclass from the filename, convert the torch state dict,
    rebuild encoder+head, run the matching validator.

    `encoder_ckpt` supplies the pretrained trunk the head was trained
    against (upstream torch `.pth` or a convert_weights orbax dir — see
    load_encoder_checkpoint). Without it the encoder is the deterministic
    seed-random init: fine for heads trained by THIS framework against the
    same seed, meaningless for reference-trained heads (a warning is
    printed)."""
    import jax

    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.pipeline.train import default_encoder_params
    from vit_ad_tpu.registry import get_model
    from vit_ad_tpu.utils import torch_convert as tc

    num_gaussians, dataclass = parse_pth_filename(pth_path, arch)
    base = os.path.join(data_root, dataclass) if data_root else dataclass
    hp = HyperParams(
        model_name=model_name, architecture=arch, img_size=img_size,
        hidden_ratio=hidden_ratio, flow_steps=flow_steps,
        num_gaussians=num_gaussians or 150, data_class=dataclass,
    )
    if dtypes is not None:
        # e.g. DtypePolicy.f32() for bit-tight cross-framework comparisons
        # (tests/test_cross_framework.py); default stays the bf16 TPU policy
        hp.dtypes = dtypes
    encoder = get_model(hp.model_name, hp.img_size, hp.dtypes)
    enc_params = default_encoder_params(encoder, hp)
    if encoder_ckpt:
        enc_params = load_encoder_checkpoint(
            encoder, hp.model_name, encoder_ckpt, hp.img_size, enc_params
        )
    else:
        print(
            "validate_pth: no encoder checkpoint given (-E) — evaluating "
            "against the seed-random trunk; reference-trained heads need "
            "their pretrained trunk weights for meaningful scores"
        )
    mean, std = default_norm_stats()
    test = DataPipeline(
        batch_size=hp.batch_size, base_path=base, data_path=test_pref,
        img_size=hp.img_size, validation_mode=True,
    )
    sd = tc.load_pth(pth_path)

    if arch == "mdn":
        from vit_ad_tpu.models.mdn import GaussianMDN
        from vit_ad_tpu.pipeline.eval import evaluate_mdn

        d = encoder.embed_dim
        mdn = GaussianMDN(features=d, num_gaussians=hp.num_gaussians)
        target = mdn.init(jax.random.key(0), jnp.zeros((1, 1, d)))
        head = tc.merge_variables(target, tc.convert_mdn_head(sd))
        return evaluate_mdn(encoder, enc_params, mdn, head, test, hp, mean, std)

    if arch == "nf":
        from vit_ad_tpu.models.flow import NormalizingFlow
        from vit_ad_tpu.pipeline.eval import evaluate_nf

        converted, perms = tc.convert_nf_head(sd, hp.flow_steps)
        p = encoder.num_patches
        flow = NormalizingFlow(
            num_channels=encoder.embed_dim, img_size=hp.img_size,
            num_patches=p, hidden_ratio=hp.hidden_ratio,
            flow_steps=hp.flow_steps, perms=perms, dtypes=hp.dtypes,
        )
        side = int(np.sqrt(p))
        target = flow.init(
            jax.random.key(0), jnp.zeros((1, side, side, encoder.embed_dim))
        )
        head = tc.merge_variables(target, converted)
        return evaluate_nf(encoder, enc_params, flow, head, test, hp, mean, std)

    if arch == "recon":
        from vit_ad_tpu.pipeline.eval import evaluate_recon

        # reference recon .pth = the whole AutoEncoder state dict (frozen
        # encoder + trained decoder, reference TrainingsHelper.py:112-122)
        model = get_model(hp.model_name, hp.img_size, hp.dtypes)
        target = model.init(
            jax.random.key(0),
            jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32),
            train=True,
        )
        variables = tc.merge_variables(
            target, tc.convert_recon_ae(sd, img_size=hp.img_size)
        )
        return evaluate_recon(model, variables, test, hp, mean, std)

    raise ValueError(
        f"legacy .pth re-evaluation supports mdn|nf|recon, got {arch!r}"
    )


def validate_pth_resnet_mdn(
    pth_stage2: str,
    pth_stage3: str,
    data_root: str,
    test_pref: str = "test",
    img_size: int = 224,
    encoder_ckpt: str = "",
):
    """Re-evaluate the reference's two-file ResNet-MDN legacy checkpoints
    (reference validation_loop.validate_mdn_resnet:87-160 pairs one .pth per
    stage GMM positionally; stage channels 1024/2048 = res_net stages 2,3).

    `encoder_ckpt` should point at ImageNet resnet50 weights (torchvision
    .pth or a convert_weights orbax dir): the reference's GMMs were trained
    on a frozen ImageNet-pretrained trunk (reference CnnEncoder.py:140-145),
    so without it the evaluation runs against a random trunk (warned)."""
    import jax

    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.models.resnet import STAGE_CHANNELS, ResNetEncoder
    from vit_ad_tpu.pipeline.eval import evaluate_mdn_resnet
    from vit_ad_tpu.utils import torch_convert as tc

    num_gaussians, dataclass = parse_pth_filename(pth_stage2, "mdn")
    hp = HyperParams(
        model_name="res_net", architecture="mdn", img_size=img_size,
        num_gaussians=num_gaussians or 150, data_class=dataclass,
    )
    base = os.path.join(data_root, dataclass) if data_root else dataclass
    test = DataPipeline(
        batch_size=hp.batch_size, base_path=base, data_path=test_pref,
        img_size=hp.img_size, validation_mode=True,
    )
    encoder = ResNetEncoder(img_size=hp.img_size, dtypes=hp.dtypes)
    enc_variables = encoder.init(
        jax.random.split(jax.random.key(hp.seed))[1],
        jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32),
    )
    if encoder_ckpt:
        enc_variables = load_encoder_checkpoint(
            encoder, "res_net", encoder_ckpt, hp.img_size, enc_variables
        )
    else:
        print(
            "validate_pth_resnet_mdn: no encoder checkpoint given (-E) — "
            "evaluating against a random resnet50 trunk; the reference's "
            "GMM heads were trained on ImageNet-pretrained features"
        )
    stages = (2, 3)
    mdns, heads = [], []
    for i, pth in zip(stages, (pth_stage2, pth_stage3)):
        d = STAGE_CHANNELS[i]
        mdn = GaussianMDN(features=d, num_gaussians=hp.num_gaussians)
        target = mdn.init(jax.random.key(0), jnp.zeros((1, 1, d)))
        head = tc.merge_variables(
            target, tc.convert_mdn_head(tc.load_pth(pth))
        )
        mdns.append(mdn)
        heads.append(head)
    mean, std = default_norm_stats()
    return evaluate_mdn_resnet(
        encoder, enc_variables, mdns, heads, test, hp, mean, std,
        stages=stages,
    )


def main(argv):
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
