"""Export a trained run (or legacy reference `.pth` weights) as an AOT
serving bundle — `python -m vit_ad_tpu.cli.export_serving`.

The bundle (serving/aot.py) is the compiled uint8→scores program with the
run's weights baked in: the serving site loads it with jax alone — no model
code, registry, or checkpoint conversion (the reference's deployment story
requires the full torch model zoo per weight file, reference
validation_loop.py:248-274).

    # export a run directory for CPU and TPU serving, batch 64
    python -m vit_ad_tpu.cli.export_serving -r runs/<run> -o bundle/ \
        -b 64 --platforms cpu,tpu

    # export reference-format legacy .pth weights (migration path)
    python -m vit_ad_tpu.cli.export_serving --pth 100_gaussians_bottle.pth \
        -a mdn --model enc_deit -E deit.pth -o bundle/

    # score a folder with a bundle (round-trip check)
    python - <<'PY'
    from vit_ad_tpu.serving.aot import load_bundle
    from vit_ad_tpu.cli.score import list_images
    scores, maps = load_bundle("bundle/").score_files(list_images("imgs/"))
    PY
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="export_serving",
        description="Export a trained run as an AOT serving bundle "
        "(jax.export StableHLO artifact with weights baked in).",
    )
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("-r", "--run", help="training run directory "
                     "(config.json + best_params checkpoint)")
    src.add_argument("--pth", nargs="+", metavar="PTH",
                     help="reference-format legacy .pth weight file(s); two "
                     "files = the ResNet-MDN two-file convention")
    ap.add_argument("-a", "--arch", choices=["mdn", "nf", "recon"],
                    help="head architecture (required with --pth)")
    ap.add_argument("--model", default="enc_deit",
                    help="backbone registry key for --pth (default enc_deit)")
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--hidden-ratio", type=float, default=0.16)
    ap.add_argument("--flow-steps", type=int, default=20)
    ap.add_argument("-E", "--encoder-ckpt", default="",
                    help="pretrained trunk weights for --pth heads "
                    "(torch .pth or convert_weights orbax dir)")
    ap.add_argument("-o", "--out", required=True, help="bundle output dir")
    ap.add_argument("-b", "--batch", type=int, default=32,
                    help="baked batch size (serving pads/loops; default 32)")
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering targets, e.g. cpu,tpu "
                    "(default: this host's platform)")
    ap.add_argument("--native", action="store_true",
                    help="keep Pallas TPU kernels in the graph (TPU-only "
                    "artifact; default exports portable pure-StableHLO)")
    ap.add_argument("--payload", choices=["full", "scores"], default="full",
                    help="full = evaluator device payload (anomaly maps; "
                    "~200 KB/img fetch); scores = in-graph image-score "
                    "tail, [B] floats only — for threshold-on-image-score "
                    "deployments on bandwidth-limited links (MDN kinds "
                    "need --ref-images)")
    ap.add_argument("--weights", choices=["baked", "external"],
                    default="baked",
                    help="baked = params folded into scorer.bin as "
                    "constants (self-contained); external = params as "
                    "program inputs + weights.npz beside it (keeps the "
                    "serialized module small — required for runtimes that "
                    "ship the module through a size-limited compile RPC)")
    ap.add_argument("--train-data", default="",
                    help="training image dir — required for --centering "
                    "runs so the baked mean/std match training")
    ap.add_argument("--ref-images", default="",
                    help="image dir (e.g. the training images) whose max "
                    "log-likelihood is baked into MDN bundles as a FIXED "
                    "score normalizer, making serving scores comparable "
                    "across calls; default: the reference's per-call-set "
                    "normalization")
    args = ap.parse_args(argv)

    from vit_ad_tpu.cli.score import _build_pth_models_cli, _norm_stats_for
    from vit_ad_tpu.serving.aot import export_bundle

    if args.run:
        from vit_ad_tpu.pipeline.loading import load_run

        models, _cfg = load_run(args.run)
        source = args.run
    else:
        if not args.arch:
            ap.error("--pth needs -a/--arch")
        models = _build_pth_models_cli(
            args.pth, args.arch, args.model, args.img_size,
            args.hidden_ratio, args.flow_steps, args.encoder_ckpt,
        )
        source = args.pth[0]

    mean, std = _norm_stats_for(models.hp, args.train_data)
    platforms = [p for p in args.platforms.split(",") if p] or None
    ref_images = None
    if args.ref_images:
        import numpy as np

        from vit_ad_tpu.cli.score import list_images
        from vit_ad_tpu.data.loader import DataPipeline

        pipe = DataPipeline(
            batch_size=args.batch, img_size=models.hp.img_size,
            files=list_images(args.ref_images),
        )
        ref_images = np.concatenate(
            [b.images[: int(b.valid.sum())]
             for b in pipe.test_batches(prefetch=0, host=True)],
            axis=0,
        )
    manifest = export_bundle(
        models, args.out, batch=args.batch, platforms=platforms,
        portable=not args.native, mean=mean, std=std,
        extra_meta={"source": source}, ref_images=ref_images,
        weights=args.weights, payload=args.payload,
    )
    print(f"exported {manifest['kind']} bundle → {args.out} "
          f"(batch {manifest['batch']}, platforms {manifest['platforms']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
