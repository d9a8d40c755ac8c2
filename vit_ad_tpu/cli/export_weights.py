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
AutoEncoder .pth files: transformer AEs (`encoder.model.*` timm layout +
`decoder.*`, torch_convert.export_transformer_ae) and ResNet AEs
(`encoder.res_net.*` + `encoder.norms.*` + `decoder.*`, export_resnet_ae —
the frozen trunk's unused classifier fc is emitted zeroed) and the vanilla
CNN AE (export_vanilla_ae). The EfficientNet AE and the multi-stage ResNet
ensembles are not exportable (no reference legacy import path either).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


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
    tree = load_tree(os.path.abspath(ckpts[0]))

    name = cfg.get("model_name", "")
    try:
        if arch in ("mdn", "nf") and "res_net" in name:
            print("multi-stage ResNet-trunk runs store per-stage heads + "
                  "trainable stage norms; the reference has no single-.pth "
                  "format for them (it re-trains those in place)",
                  file=sys.stderr)
            return 2
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
            elif name.startswith(("ae_deit", "ae_vit")):
                sd = tc.export_transformer_ae(tree)
            else:
                print(f"recon export supports the vanilla / ViT-DeiT "
                      f"transformer / ResNet AEs (the reference layouts "
                      f"with exporters); got {name!r}", file=sys.stderr)
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
