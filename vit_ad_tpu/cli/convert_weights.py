"""Checkpoint conversion CLI: torch .pth → orbax params for our encoders.

Usage (mirrors the reference's implicit weight plumbing — it downloads timm/
torchvision checkpoints at model build, reference TransformerEncoder.py:134,
CnnEncoder.py:141-145; here conversion is an explicit, inspectable step):

    python -m vit_ad_tpu.cli.convert_weights \
        --arch deit --src deit_base_distilled_patch16_224.pth --dst ckpt/deit
    python -m vit_ad_tpu.cli.convert_weights --arch resnet50 --src resnet50.pth --dst ckpt/rn50
    python -m vit_ad_tpu.cli.convert_weights --arch esvit --src checkpoint_best.pth --dst ckpt/esvit

The result loads with utils.checkpoint.load_params against the matching
encoder's init tree, or directly via `load_encoder_params`.
"""

from __future__ import annotations

import argparse
import sys


# registry model key → converter arch (validation_loop and scripts use this
# to pick the right converter for an encoder checkpoint)
MODEL_ARCH = {
    "enc_deit": "deit",
    "enc_vit": "vit",
    "enc_esvit": "esvit",
    "enc_nest": "nest",
    "enc_eff_former": "efficientformer",
    "enc_eff_net": "efficientnet",
    "enc_res_net": "resnet50",
    "res_net": "resnet50",
}


def convert_state_dict(arch: str, sd, img_size: int = 224):
    """Dispatch a torch state dict to the matching strict converter.
    Returns (encoder_module, converted_variables) — the caller merges into
    the encoder's init tree."""
    from vit_ad_tpu.utils import torch_convert as tc

    if arch in ("deit", "vit"):
        from vit_ad_tpu.models.vit import (
            deit_base_distilled_patch16,
            vit_base_patch16,
        )

        encoder = (
            deit_base_distilled_patch16(img_size)
            if arch == "deit"
            else vit_base_patch16(img_size)
        )
        converted = tc.convert_vit(
            sd, depth=12, num_prefix_tokens=2 if arch == "deit" else 1
        )
    elif arch == "resnet50":
        from vit_ad_tpu.models.resnet import ResNetEncoder

        encoder = ResNetEncoder(img_size=img_size)
        # two torch layouts arrive here: bare torchvision resnet50 keys
        # (conv1.weight, ...) and the reference's full ResNetEncoder
        # (trunk under `res_net.` + trainable stage `norms.{i}` — what
        # export_weights emits for multi-stage runs so trained norms
        # survive the round trip; the reference itself never saves them,
        # reference TrainingsHelper.py:112-122 saves `models=mdn_list` only)
        if any(k.startswith("res_net.") for k in sd):
            converted = tc.convert_resnet_encoder(sd)
        else:
            converted = tc.convert_resnet50(sd)
    elif arch == "esvit":
        from vit_ad_tpu.models.swin import esvit_swin_tiny

        encoder = esvit_swin_tiny(img_size)
        # the 'student' container and 'module.' prefix were already unwrapped
        # by load_pth / strip_prefix (reference TransformerEncoder.py:242-256)
        inner = tc.convert_swin(sd, img_size=img_size)
        converted = {"params": inner["params"]}
    elif arch == "nest":
        from vit_ad_tpu.models.nest import nest_tiny

        encoder = nest_tiny(img_size)
        converted = tc.convert_nest(sd)
    elif arch == "efficientformer":
        from vit_ad_tpu.models.efficientformer import efficientformer_l3

        encoder = efficientformer_l3(img_size)
        converted = tc.convert_efficientformer(sd)
    elif arch == "efficientnet":
        from vit_ad_tpu.models.efficientnet import EfficientNetEncoder

        encoder = EfficientNetEncoder(img_size=img_size)
        converted = tc.convert_efficientnet(sd)
    else:
        raise SystemExit(
            f"unknown arch {arch!r} "
            "(deit|vit|resnet50|esvit|nest|efficientformer|efficientnet)"
        )
    return encoder, converted


def convert(arch: str, src: str, dst: str, img_size: int = 224) -> str:
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.utils import torch_convert as tc
    from vit_ad_tpu.utils.checkpoint import save_params

    sd = tc.load_pth(src)
    sd = tc.strip_prefix(sd, "module.")
    encoder, converted = convert_state_dict(arch, sd, img_size)

    base = encoder.init(
        jax.random.key(0), jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    )
    merged = tc.merge_variables(base, converted)
    path = save_params(dst, "encoder", merged)
    print(f"converted {arch} weights → {path}")
    return path


def load_encoder_params(arch_dir: str, encoder, img_size: int = 224):
    """Restore converted encoder variables saved by this CLI."""
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.utils.checkpoint import load_params

    target = encoder.init(
        jax.random.key(0), jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    )
    return load_params(arch_dir, target)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arch", required=True,
                    choices=["deit", "vit", "resnet50", "esvit", "nest",
                             "efficientformer", "efficientnet"])
    ap.add_argument("--src", required=True, help="torch .pth checkpoint")
    ap.add_argument("--dst", required=True, help="output checkpoint directory")
    ap.add_argument("--img-size", type=int, default=224)
    args = ap.parse_args(argv)
    convert(args.arch, args.src, args.dst, args.img_size)


if __name__ == "__main__":
    main(sys.argv[1:])
