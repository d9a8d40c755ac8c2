"""Rebuild a trained run's models from its run directory.

The model-rebuilding half of checkpoint re-evaluation (reference
validation_loop.py:248-274 rebuilds model+Validator per saved .pth file).
Here every training run directory written by startTraining_*.py carries a
config.json and an orbax best_params* checkpoint; this module turns one into
live models + restored params, with a score/evaluate dispatch shared by
labeled re-evaluation (validation_loop.py) and label-free folder scoring
(cli/score.py).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_ad_tpu.config import HyperParams


def hp_from_config(cfg: dict) -> HyperParams:
    """HyperParams from a run's config.json (unknown keys ignored; 'dtypes'
    and 'mesh' are excluded from to_log_dict, so restored runs score
    single-device at the default dtype policy unless re-requested)."""
    hp = HyperParams()
    for k, v in cfg.items():
        if hasattr(hp, k):
            setattr(hp, k, v)
    return hp


def load_run_config(run_dir: str) -> Tuple[HyperParams, Dict[str, Any]]:
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = json.load(f)
    return hp_from_config(cfg), cfg


def find_checkpoint(run_dir: str) -> str:
    ckpts = glob.glob(os.path.join(run_dir, "best_params*"))
    # a crash mid-save leaves an orbax 'best_params.orbax-checkpoint-tmp-*'
    # next to the committed dir — never restore a tmp artifact
    ckpts = [c for c in ckpts if "orbax-checkpoint-tmp" not in c]
    if not ckpts:
        raise FileNotFoundError(f"no checkpoint in {run_dir}")
    # prefer the committed orbax dir over any fallback artifact; sort so a
    # tie is deterministic (glob order is os.listdir-arbitrary)
    exact = os.path.join(run_dir, "best_params")
    if exact in ckpts:
        return os.path.abspath(exact)
    return os.path.abspath(sorted(ckpts)[0])  # orbax needs absolute paths


@dataclass
class RunModels:
    """Live models + restored params for one run.

    `kind` selects the score/evaluate dispatch; `parts` is the positional
    model/params prefix the matching `pipeline.eval.score_*` /
    `evaluate_*` function expects before (test_data, hp, ...).
    """

    kind: str  # 'mdn' | 'nf' | 'recon' | 'mdn_resnet' | 'nf_resnet'
    hp: HyperParams
    parts: Tuple[Any, ...]
    stages: Optional[Tuple[int, ...]] = None


def _restore_resnet_joint(ckpt: str, heads, enc_variables):
    """Restore the resnet trainers' joint checkpoint. New checkpoints carry
    the trunk's BN running stats as 'enc_batch_stats' (a caller-supplied
    pretrained encoder has real ImageNet stats — restoring fresh init stats
    would silently change scores); pre-existing checkpoints lack the key
    and fall back to the deterministic seed-init stats they trained with."""
    from vit_ad_tpu.utils.checkpoint import load_params

    init_stats = enc_variables.get("batch_stats", {})
    target = {"heads": heads, "encoder": enc_variables["params"],
              "enc_batch_stats": init_stats}
    try:
        best = load_params(ckpt, target)
        stats = best.get("enc_batch_stats", init_stats)
    except (ValueError, KeyError, TypeError):
        target.pop("enc_batch_stats")
        best = load_params(ckpt, target)
        stats = init_stats
    return best, {"batch_stats": stats}


def _build_resnet_models(hp: HyperParams, arch: str, ckpt: str) -> RunModels:
    """Rebuild the multi-stage ResNet head ensembles and restore the joint
    {'heads': [...], 'encoder': ...} checkpoint the resnet trainers save."""
    from vit_ad_tpu.models.resnet import (
        STAGE_CHANNELS,
        STAGE_SCALES,
        ResNetEncoder,
    )

    from vit_ad_tpu.pipeline.train import default_encoder_params

    encoder = ResNetEncoder(img_size=hp.img_size, dtypes=hp.dtypes)
    enc_variables = default_encoder_params(encoder, hp)

    if arch == "mdn":
        from vit_ad_tpu.models.mdn import GaussianMDN

        stages = (2, 3)
        mdns = [
            GaussianMDN(features=STAGE_CHANNELS[i],
                        num_gaussians=hp.num_gaussians)
            for i in stages
        ]
        heads = [
            m.init(jax.random.key(0), jnp.zeros((1, 1, STAGE_CHANNELS[i])))
            for i, m in zip(stages, mdns)
        ]
        best, enc_stats = _restore_resnet_joint(ckpt, heads, enc_variables)
        return RunModels(
            kind="mdn_resnet", hp=hp, stages=stages,
            parts=(encoder, {"params": best["encoder"], **enc_stats},
                   mdns, best["heads"]),
        )

    from vit_ad_tpu.models.flow import NormalizingFlow

    stages = (0, 1, 2)
    flows, heads = [], []
    for i in stages:
        side = hp.img_size // STAGE_SCALES[i]
        flow = NormalizingFlow(
            num_channels=STAGE_CHANNELS[i], img_size=hp.img_size,
            num_patches=side * side, hidden_ratio=hp.hidden_ratio,
            flow_steps=hp.flow_steps, dtypes=hp.dtypes,
        )
        flows.append(flow)
        heads.append(
            flow.init(jax.random.key(0),
                      jnp.zeros((1, side, side, STAGE_CHANNELS[i])))
        )
    best, enc_stats = _restore_resnet_joint(ckpt, heads, enc_variables)
    return RunModels(
        kind="nf_resnet", hp=hp, stages=stages,
        parts=(encoder, {"params": best["encoder"], **enc_stats},
               flows, best["heads"]),
    )


def build_run_models(hp: HyperParams, ckpt: str) -> RunModels:
    """Rebuild the run's models (deterministic per-seed init for the frozen
    encoder, reference behavior) and restore the trained head/decoder params
    from the orbax checkpoint."""
    from vit_ad_tpu.registry import get_model
    from vit_ad_tpu.utils.checkpoint import load_params

    arch = hp.architecture
    if "res_net" in hp.model_name and arch in ("mdn", "nf"):
        return _build_resnet_models(hp, arch, ckpt)
    if arch == "mdn":
        from vit_ad_tpu.models.mdn import GaussianMDN
        from vit_ad_tpu.pipeline.train import default_encoder_params

        encoder = get_model(hp.model_name, hp.img_size, hp.dtypes)
        enc_params = default_encoder_params(encoder, hp)
        embed_dim = encoder.embed_dim
        mdn = GaussianMDN(features=embed_dim, num_gaussians=hp.num_gaussians)
        target = mdn.init(jax.random.key(0), jnp.zeros((1, 1, embed_dim)))
        head = load_params(ckpt, target)
        return RunModels(kind="mdn", hp=hp,
                         parts=(encoder, enc_params, mdn, head))
    if arch == "nf":
        from vit_ad_tpu.models.flow import NormalizingFlow
        from vit_ad_tpu.pipeline.train import default_encoder_params

        encoder = get_model(hp.model_name, hp.img_size, hp.dtypes)
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
        return RunModels(kind="nf", hp=hp,
                         parts=(encoder, enc_params, flow, head))
    # reconstruction
    model = get_model(hp.model_name, hp.img_size, hp.dtypes)
    target = model.init(
        jax.random.key(0),
        jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32),
        train=True,
    )
    variables = load_params(ckpt, target)
    return RunModels(kind="recon", hp=hp, parts=(model, variables))


def load_run(run_dir: str) -> Tuple[RunModels, Dict[str, Any]]:
    """One-call form: run directory → (RunModels, raw config dict)."""
    hp, cfg = load_run_config(run_dir)
    return build_run_models(hp, find_checkpoint(run_dir)), cfg


# ---- legacy reference-format torch .pth checkpoints ------------------------


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
        lead = stem.split("_")[0]
        if not lead.isdigit():
            raise SystemExit(
                f"MDN .pth filenames must lead with the gaussian count "
                f"(reference convention '<K>_..._<dataclass>.pth', e.g. "
                f"'100_gaussians_bottle.pth'); got {os.path.basename(filename)!r}"
            )
        num_gaussians = int(lead)
    return num_gaussians, dataclass


def load_encoder_checkpoint(model_name: str, encoder_ckpt: str,
                            img_size: int, target):
    """Pretrained trunk weights for legacy-head re-evaluation: the
    reference's heads were trained on frozen pretrained encoders (reference
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


def build_pth_models(
    pth_path: str,
    model_name: str,
    arch: str,
    img_size: int = 224,
    hidden_ratio: float = 0.16,
    flow_steps: int = 20,
    encoder_ckpt: str = "",
    dtypes=None,
) -> RunModels:
    """Rebuild live models from a reference-format torch `.pth` head
    checkpoint (reference validation_loop.validate_mdn/:35, validate_nf/:161):
    parse num_gaussians/dataclass from the filename, convert the torch state
    dict through the strict converters, rebuild encoder+head.

    `encoder_ckpt` supplies the pretrained trunk the head was trained
    against (upstream torch `.pth` or a convert_weights orbax dir — see
    load_encoder_checkpoint). Without it the encoder is the deterministic
    seed-random init: fine for heads trained by THIS framework against the
    same seed, meaningless for reference-trained heads (a warning is
    printed)."""
    from vit_ad_tpu.pipeline.train import default_encoder_params
    from vit_ad_tpu.registry import get_model
    from vit_ad_tpu.utils import torch_convert as tc

    num_gaussians, dataclass = parse_pth_filename(pth_path, arch)
    hp = HyperParams(
        model_name=model_name, architecture=arch, img_size=img_size,
        hidden_ratio=hidden_ratio, flow_steps=flow_steps,
        num_gaussians=num_gaussians or 150, data_class=dataclass,
    )
    if dtypes is not None:
        # e.g. DtypePolicy.f32() for bit-tight cross-framework comparisons
        # (tests/test_cross_framework.py); default stays the bf16 TPU policy
        hp.dtypes = dtypes

    if arch == "recon":
        # reference recon .pth = the whole AutoEncoder state dict (frozen
        # encoder + trained decoder, reference TrainingsHelper.py:112-122)
        if encoder_ckpt:
            print(
                "build_pth_models (recon): -E/--encoder-ckpt ignored — a "
                "recon .pth is the WHOLE AutoEncoder (its own frozen "
                "encoder included); the file's encoder weights are used"
            )
        sd = tc.load_pth(pth_path)
        model = get_model(hp.model_name, hp.img_size, hp.dtypes)
        target = model.init(
            jax.random.key(0),
            jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32),
            train=True,
        )
        variables = tc.merge_variables(
            target, tc.convert_recon_ae(sd, img_size=hp.img_size)
        )
        return RunModels(kind="recon", hp=hp, parts=(model, variables))

    encoder = get_model(hp.model_name, hp.img_size, hp.dtypes)
    enc_params = default_encoder_params(encoder, hp)
    if encoder_ckpt:
        enc_params = load_encoder_checkpoint(
            hp.model_name, encoder_ckpt, hp.img_size, enc_params
        )
    else:
        print(
            f"build_pth_models ({arch}): no encoder checkpoint given (-E) — "
            "evaluating against the seed-random trunk; reference-trained "
            "heads need their pretrained trunk weights for meaningful scores"
        )
    sd = tc.load_pth(pth_path)

    if arch == "mdn":
        from vit_ad_tpu.models.mdn import GaussianMDN

        d = encoder.embed_dim
        mdn = GaussianMDN(features=d, num_gaussians=hp.num_gaussians)
        target = mdn.init(jax.random.key(0), jnp.zeros((1, 1, d)))
        head = tc.merge_variables(target, tc.convert_mdn_head(sd))
        return RunModels(kind="mdn", hp=hp,
                         parts=(encoder, enc_params, mdn, head))

    if arch == "nf":
        from vit_ad_tpu.models.flow import NormalizingFlow

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
        return RunModels(kind="nf", hp=hp,
                         parts=(encoder, enc_params, flow, head))

    raise ValueError(
        f"legacy .pth re-evaluation supports mdn|nf|recon, got {arch!r}"
    )


def build_pth_resnet_mdn_models(
    pth_stage2: str,
    pth_stage3: str,
    img_size: int = 224,
    encoder_ckpt: str = "",
) -> RunModels:
    """Rebuild the reference's two-file ResNet-MDN legacy checkpoints
    (reference validation_loop.validate_mdn_resnet:87-160 pairs one .pth per
    stage GMM positionally; stage channels 1024/2048 = res_net stages 2,3).

    `encoder_ckpt` should point at ImageNet resnet50 weights (torchvision
    .pth or a convert_weights orbax dir): the reference's GMMs were trained
    on a frozen ImageNet-pretrained trunk (reference CnnEncoder.py:140-145),
    so without it the evaluation runs against a random trunk (warned)."""
    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.models.resnet import STAGE_CHANNELS, ResNetEncoder
    from vit_ad_tpu.utils import torch_convert as tc

    num_gaussians, dataclass = parse_pth_filename(pth_stage2, "mdn")
    hp = HyperParams(
        model_name="res_net", architecture="mdn", img_size=img_size,
        num_gaussians=num_gaussians or 150, data_class=dataclass,
    )
    from vit_ad_tpu.pipeline.train import default_encoder_params

    encoder = ResNetEncoder(img_size=hp.img_size, dtypes=hp.dtypes)
    enc_variables = default_encoder_params(encoder, hp)
    if encoder_ckpt:
        enc_variables = load_encoder_checkpoint(
            "res_net", encoder_ckpt, hp.img_size, enc_variables
        )
    else:
        print(
            "build_pth_resnet_mdn_models: no encoder checkpoint given (-E) — "
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
    return RunModels(kind="mdn_resnet", hp=hp, stages=stages,
                     parts=(encoder, enc_variables, mdns, heads))


def _dispatch(m: RunModels, prefix: str):
    from vit_ad_tpu.pipeline import eval as E

    table = {
        "mdn": E.score_mdn if prefix == "score" else E.evaluate_mdn,
        "nf": E.score_nf if prefix == "score" else E.evaluate_nf,
        "recon": E.score_recon if prefix == "score" else E.evaluate_recon,
        "mdn_resnet": (E.score_mdn_resnet if prefix == "score"
                       else E.evaluate_mdn_resnet),
        "nf_resnet": (E.score_nf_resnet if prefix == "score"
                      else E.evaluate_nf_resnet),
    }
    return table[m.kind]


def compress_params_bf16(m: RunModels) -> RunModels:
    """bf16-at-rest weights for one-shot serving — OPT-IN, measured loser.

    Hypothesis (r4 VERDICT item 3): the one-shot score CLI's cold path is
    LOAD-dominated (~350 MB f32 weight upload; tools/serving_bench.jsonl
    3.4-8.6 img/s on a 256-PNG wave), so halving the upload with a host
    cast should speed it up. MEASURED (r5, same session, warm process,
    256 PNGs): f32 32.2 s vs bf16 40.4 s — the saved upload is beaten by
    the host-side cast and the fresh remote compile the bf16-input HLO
    forces — and NF score drift reached 7.4% rel (the flow's f32-path
    consumers see real bf16 rounding). Kept as the measured decision
    record behind `--weights-dtype bf16`; the real one-shot mitigation is
    the AOT bundle (20-27x, serving/aot.py) or `--watch`."""
    import dataclasses

    def cast_leaf(a):
        if hasattr(a, "dtype") and a.dtype == jnp.float32:
            return a.astype(jnp.bfloat16)
        return a

    parts = tuple(
        jax.tree.map(cast_leaf, p) if isinstance(p, (dict, list)) else p
        for p in m.parts
    )
    return dataclasses.replace(m, parts=parts)


def score_models(m: RunModels, test_data, mean=None, std=None,
                 keep_origs: int = 0):
    """Label-free scoring dispatch: RunModels → pipeline.eval.ScoreOutput."""
    kw: Dict[str, Any] = {"keep_origs": keep_origs}
    if m.stages is not None:
        kw["stages"] = m.stages
    return _dispatch(m, "score")(*m.parts, test_data, m.hp, mean, std, **kw)


def evaluate_models(m: RunModels, test_data, mean=None, std=None,
                    figures_dir=None, logger=None) -> Dict[str, float]:
    """Labeled re-evaluation dispatch: RunModels → reference metric dict."""
    kw: Dict[str, Any] = {"figures_dir": figures_dir, "logger": logger}
    if m.stages is not None:
        kw["stages"] = m.stages
    return _dispatch(m, "evaluate")(*m.parts, test_data, m.hp, mean, std, **kw)
