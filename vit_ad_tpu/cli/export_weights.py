"""Export a trained run to a reference-format torch `.pth` — the interop
direction OPPOSITE to `cli/convert_weights.py`: TPU-trained MDN / NF heads
become state dicts the reference's torch models load with
`load_state_dict(strict=True)` (GaussianMixtureDensityNetwork layout,
reference src/classes/MixtureDensityNetwork.py:117-171; NormalizingFlow
`fast_flow_decoder.module_list.*` FrEIA layout, NormalizingFlow.py:43-116),
so a user can migrate in either direction:

    python -m vit_ad_tpu.cli.export_weights --run runs/<name> --dst head.pth

The run directory needs `config.json` + a `best_params*` checkpoint (what
every training CLI writes). Reconstruction AEs export as full reference
AutoEncoder .pth files: transformer AEs for all five families (the
family-named `encoder.{deit,vit,nest,efficientformer,esvit}.*` layouts +
`decoder.*`, torch_convert.export_transformer_ae) and ResNet AEs
(`encoder.res_net.*` + `encoder.norms.*` + `decoder.*`, export_resnet_ae —
the frozen trunk's unused classifier fc is emitted zeroed) and the vanilla
CNN AE (export_vanilla_ae). Multi-stage ResNet-trunk MDN/NF runs export one
reference-layout file per stage head plus the trained ResNetEncoder (pass a
directory as --dst; the reference saves only the head list and loses its
trained stage norms — TrainingsHelper.py:112-122 — so the encoder file is
an improvement over the reference's own artifacts). The EfficientNet AE is
not exportable (no reference legacy import path either).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _save_pth(sd, path) -> None:
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)


def _export_resnet_multistage(run_dir: str, dst: str, cfg: dict,
                              arch: str) -> int:
    """Multi-stage ResNet-trunk runs → one reference-layout `.pth` per stage
    head + the trained encoder.

    Mirrors what the reference's own training leaves behind — early_stopping
    saves each stage head's state dict as a separate file (reference
    TrainingsHelper.py:112-122 over `models=mdn_list`/`nf_list`,
    LearnerMDN.py:387, LearnerNF.py:352) — and goes one further: the
    reference never saves the ResNetEncoder, so its trained stage LayerNorms
    are unrecoverable after a run; we export them (`ResNetEncoder_*.pth`,
    reference CnnEncoder.py:150-158 layout) so both frameworks can restore
    the full model. MDN stage files are named `{K}_stage{i}_{dataclass}.pth`
    — directly parseable by the reference's validate_mdn_resnet
    (validation_loop.py:91-95: leading gaussian count, trailing dataclass)
    and by our own `validation_loop.validate_pth_resnet_mdn` (whose `-E`
    flag accepts the exported encoder file, so the trained norms are used)."""
    from vit_ad_tpu.pipeline.loading import (
        _build_resnet_models,
        find_checkpoint,
        hp_from_config,
    )
    from vit_ad_tpu.utils import torch_convert as tc

    if dst.endswith(".pth"):
        print("multi-stage ResNet runs export several files; pass an output "
              "DIRECTORY as --dst", file=sys.stderr)
        return 2
    hp = hp_from_config(cfg)
    m = _build_resnet_models(hp, arch, find_checkpoint(run_dir))
    _, enc_variables, _, heads = m.parts
    os.makedirs(dst, exist_ok=True)
    dataclass = hp.data_class or "run"

    written = []
    if arch == "mdn":
        for si, head in zip(m.stages, heads):
            path = os.path.join(
                dst, f"{hp.num_gaussians}_stage{si}_{dataclass}.pth")
            _save_pth(tc.export_mdn_head(head), path)
            written.append(path)
    else:
        from vit_ad_tpu.models.resnet import STAGE_SCALES

        for si, head in zip(m.stages, heads):
            side = hp.img_size // STAGE_SCALES[si]
            path = os.path.join(dst, f"NormalizingFlow_{si}_{dataclass}.pth")
            _save_pth(tc.export_nf_head(head, num_patches=side * side), path)
            written.append(path)

    enc_path = os.path.join(dst, f"ResNetEncoder_{dataclass}.pth")
    _save_pth(tc.export_resnet_encoder(enc_variables), enc_path)
    written.append(enc_path)
    for p in written:
        print(f"exported -> {p}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--run", required=True, help="run dir (config.json + best_params*)")
    ap.add_argument("--dst", required=True, help="output .pth path")
    args = ap.parse_args(argv)

    from vit_ad_tpu.utils import torch_convert as tc
    from vit_ad_tpu.utils.checkpoint import load_tree

    with open(os.path.join(args.run, "config.json")) as f:
        cfg = json.load(f)
    arch = cfg.get("architecture", "")
    ckpts = glob.glob(os.path.join(args.run, "best_params*"))
    if not ckpts:
        print(f"no best_params* checkpoint in {args.run}", file=sys.stderr)
        return 2

    name = cfg.get("model_name", "")
    try:
        if arch in ("mdn", "nf") and "res_net" in name:
            # joint {'heads': [...], 'encoder': ...} checkpoint — restored
            # against its target tree inside (list-typed nodes need one)
            return _export_resnet_multistage(args.run, args.dst, cfg, arch)
        tree = load_tree(os.path.abspath(ckpts[0]))
        if arch == "mdn":
            sd = tc.export_mdn_head(tree)
        elif arch == "nf":
            from vit_ad_tpu.registry import get_model

            enc = get_model(name, int(cfg.get("img_size", 224)))
            sd = tc.export_nf_head(tree, num_patches=enc.num_patches)
        elif arch == "reconstruction":
            if name.startswith("ae_res_net"):
                sd = tc.export_resnet_ae(tree)
            elif name == "ae_cnn":
                sd = tc.export_vanilla_ae(tree)
            elif name.startswith(("ae_deit", "ae_vit", "ae_nest",
                                  "ae_esvit", "ae_eff_former")):
                sd = tc.export_transformer_ae(tree)
            else:
                print(f"recon export supports the vanilla AE, the ResNet "
                      f"AEs, and all five transformer AE families; got "
                      f"{name!r} (ae_eff_net has no reference legacy "
                      f"format)", file=sys.stderr)
                return 2
        else:
            print(f"architecture {arch!r} has no reference .pth head format "
                  "(exportable: mdn, nf, reconstruction)", file=sys.stderr)
            return 2
    except KeyError as e:
        print(f"checkpoint tree does not match the {arch}/{name} export "
              f"layout (missing {e}); only runs written by the standard "
              f"training CLIs are exportable", file=sys.stderr)
        return 2

    import torch

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.dst)
    print(f"exported {arch} head ({len(sd)} tensors) -> {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
