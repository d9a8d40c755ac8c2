"""Score a folder of unlabeled images with a trained run.

The serving-side counterpart of `validation_loop.py`: re-evaluation needs a
labeled MVTec/BTAD-layout test set with ground-truth masks, but a production
user has a run directory and a folder of fresh images. This CLI loads the
run (config.json + orbax best_params*, any of the five head families incl.
the multi-stage ResNet ensembles), scores every image, and writes per-image
anomaly scores + optional heatmap overlays — no labels, no metrics.

    python -m vit_ad_tpu.cli.score -r runs/<name> -d /path/to/images \\
        [-o out_dir] [--heatmaps N] [--train-data DIR] [-b BATCH]

Reference-format legacy `.pth` weights serve directly too (a reference user
keeps their trained checkpoints and just points this at a folder; two .pth
files = the ResNet-MDN two-file convention; `-E` supplies the pretrained
trunk reference heads were trained against):

    python -m vit_ad_tpu.cli.score --pth 100_gaussians_bottle.pth -a mdn \\
        -E deit_base_distilled_patch16_224.pth -d /path/to/images

Outputs (under -o, default <run>/scores):
  scores.csv      path,image_score — one row per input image, input order
  summary.json    n_images, score stats, run config echo
  heatmaps/       top-N overlay PNGs (anomaly map over the image, jet)

Continuous serving: `--watch SECS` turns the CLI into a long-lived scorer
that polls the images dir and appends scores for newly arrived images
(models loaded once; padded static batch shapes + JAX's persistent
compilation cache make wave 2+ compile-free; resumes from an existing
scores.csv after interruption). `--watch-waves N` bounds the loop.

Scoring semantics are the validators' own (pipeline/eval.py): NF/recon image
score = max over the anomaly map; MDN = 1 - min(prob) with the probability
normalization GLOBAL over the scored set (reference ValidatorMDN.py:133) —
MDN scores are comparable within one invocation, not across invocations.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from typing import List, Optional

import numpy as np

from vit_ad_tpu.data.files import IMAGE_EXTENSIONS


def list_images(images_dir: str) -> List[str]:
    """Every image under images_dir (recursive), sorted — deterministic
    input order, mirrored row-for-row by scores.csv."""
    out: List[str] = []
    for root, _, fs in os.walk(images_dir):
        for f in fs:
            if f.lower().endswith(IMAGE_EXTENSIONS):
                out.append(os.path.join(root, f))
    return sorted(out)


def _norm_stats_for(hp, train_data: str):
    """Match training-time standardization: `--train-data` recomputes the
    reference's compute_mean_stdev stats for centering runs; everything else
    uses the ImageNet defaults the trainers use."""
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.data.loader import DataPipeline

    if hp.centering:
        if not train_data:
            raise SystemExit(
                "this run trained with --centering (per-dataset mean/std); "
                "pass --train-data <the training image dir> so scoring "
                "standardizes the same way"
            )
        pipe = DataPipeline(batch_size=hp.batch_size, img_size=hp.img_size,
                            files=list_images(train_data))
        # compute_mean_std streams train_files; files= fills test_files
        pipe.train_files = pipe.test_files
        return pipe.compute_mean_std()
    return default_norm_stats()


def _resolve_weights_dtype(choice: str) -> str:
    """'auto' = f32. bf16-at-rest is STRICTLY opt-in: the hardware A/B
    (tools/serving_bench.jsonl, r5) measured the bf16 one-shot wave
    SLOWER (40.4 s vs 32.2 s for 256 PNGs — the halved upload is beaten
    by the host-side cast plus a fresh remote compile for the bf16-input
    HLO) and NF scores drifted up to 7.4% rel. The cold path's real
    mitigation is the AOT bundle (156.7 img/s scores-only vs 5.8-7.9 for
    the one-shot CLI, same session) or --watch; scoring stays
    bit-comparable to training-time eval by default."""
    if choice != "auto":
        return choice
    return "f32"


def _maybe_compress(models, weights_dtype: str):
    if _resolve_weights_dtype(weights_dtype) == "bf16":
        from vit_ad_tpu.pipeline.loading import compress_params_bf16

        return compress_params_bf16(models)
    return models


def score_folder(
    run_dir: str,
    images_dir: str,
    out_dir: Optional[str] = None,
    heatmaps: int = 0,
    batch: int = 0,
    train_data: str = "",
    mesh: str = "",
    weights_dtype: str = "auto",
) -> dict:
    """Score every image under images_dir with a run directory's models."""
    from vit_ad_tpu.pipeline.loading import load_run

    models, cfg = load_run(run_dir)
    models = _maybe_compress(models, weights_dtype)
    return _score_with_models(
        models, run_dir, cfg, images_dir,
        out_dir or os.path.join(run_dir, "scores"),
        heatmaps, batch, train_data, mesh,
    )


def score_pth(
    pths: List[str],
    arch: str,
    images_dir: str,
    out_dir: Optional[str] = None,
    model_name: str = "enc_deit",
    img_size: int = 224,
    hidden_ratio: float = 0.16,
    flow_steps: int = 20,
    encoder_ckpt: str = "",
    heatmaps: int = 0,
    batch: int = 0,
    train_data: str = "",
    mesh: str = "",
    weights_dtype: str = "auto",
) -> dict:
    """Score a folder with reference-format legacy `.pth` weights — a
    reference user serves fresh images with their EXISTING trained
    checkpoints, no re-training (mdn/nf heads, full recon AEs; two .pth
    files = the ResNet-MDN two-file convention). Pass `encoder_ckpt` for
    reference-trained heads (pretrained trunk, see
    pipeline/loading.build_pth_models)."""
    models = _build_pth_models_cli(
        pths, arch, model_name, img_size, hidden_ratio, flow_steps,
        encoder_ckpt,
    )
    models = _maybe_compress(models, weights_dtype)
    return _score_with_models(
        models, pths[0], {"architecture": arch}, images_dir,
        out_dir or os.path.splitext(pths[0])[0] + "_scores",
        heatmaps, batch, train_data, mesh,
    )


def _build_pth_models_cli(pths, arch, model_name, img_size, hidden_ratio,
                          flow_steps, encoder_ckpt):
    """Legacy-.pth model building shared by the one-shot and --watch paths
    (two .pth files = the ResNet-MDN two-file convention)."""
    from vit_ad_tpu.pipeline.loading import (
        build_pth_models,
        build_pth_resnet_mdn_models,
    )

    if len(pths) == 2:
        if arch != "mdn":
            raise SystemExit("two .pth files = the ResNet-MDN convention; "
                             "use -a mdn")
        return build_pth_resnet_mdn_models(
            pths[0], pths[1], img_size=img_size, encoder_ckpt=encoder_ckpt,
        )
    return build_pth_models(
        pths[0], model_name, arch, img_size=img_size,
        hidden_ratio=hidden_ratio, flow_steps=flow_steps,
        encoder_ckpt=encoder_ckpt,
    )


def _prepare_hp(models, batch: int, mesh: str, train_data: str):
    """Apply CLI overrides to the run's HyperParams; return (hp, mean, std)."""
    hp = models.hp
    if batch:
        hp.batch_size = batch
    if mesh:
        # multi-chip serving: the evaluators self-setup from hp.mesh and
        # shard scoring batches over the data axis (pipeline/eval._eval_mesh)
        from vit_ad_tpu.config import MeshConfig

        hp.mesh = MeshConfig.parse(mesh)
    mean, std = _norm_stats_for(hp, train_data)
    return hp, mean, std


def _score_files(models, files: List[str], hp, mean, std):
    """Score an explicit file list (padded static batches → stable shapes,
    so repeated waves reuse compiled executables)."""
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.pipeline.loading import score_models

    pipe = DataPipeline(batch_size=hp.batch_size, img_size=hp.img_size,
                        files=files)
    return score_models(models, pipe, mean, std)


def _score_with_models(
    models, source: str, cfg: dict, images_dir: str, out_dir: str,
    heatmaps: int, batch: int, train_data: str, mesh: str = "",
) -> dict:
    """Shared scoring body: write scores.csv / summary.json / heatmaps/
    under out_dir and return the summary dict."""
    files = list_images(images_dir)
    if not files:
        raise SystemExit(f"no images found under {images_dir!r}")

    hp, mean, std = _prepare_hp(models, batch, mesh, train_data)
    s = _score_files(models, files, hp, mean, std)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "scores.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "image_score"])
        for path, score in zip(files, s.image_scores):
            w.writerow([path, repr(float(score))])

    if heatmaps:
        _save_heatmaps(s, files, hp, mean, std, out_dir, heatmaps)

    summary = {
        "run": source,
        "images": len(files),
        "arch": cfg.get("architecture", hp.architecture),
        "model": hp.model_name,
        "score_min": float(np.min(s.image_scores)),
        "score_mean": float(np.mean(s.image_scores)),
        "score_max": float(np.max(s.image_scores)),
        "top": [
            {"path": files[i], "image_score": float(s.image_scores[i])}
            for i in np.argsort(s.image_scores)[::-1][:5]
        ],
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def watch_folder(
    models, source: str, images_dir: str, out_dir: str,
    interval: float = 30.0, batch: int = 0, train_data: str = "",
    mesh: str = "", max_waves: int = 0,
) -> dict:
    """Continuous serving: poll images_dir every `interval` seconds and score
    images that were not scored yet, appending rows to scores.csv as they
    arrive (one long-lived process per line/camera — the production shape of
    the reference's offline validation loop).

    Compile-once behavior: the models are loaded once, the DataPipeline pads
    every wave to static [batch, img, img, 3] shapes, and JAX's persistent
    compilation cache (enabled under <out_dir>/.jax_cache) is keyed by the
    HLO itself — so wave 2+ reuses wave 1's executables even though the
    evaluators build fresh jit closures per call.

    MDN caveat (inherits reference ValidatorMDN.py:133 semantics): the
    probability normalization is global PER WAVE, so MDN scores are
    comparable within a wave, not across waves — NF/recon scores are
    wave-independent. summary.json tracks waves/images scored so far.
    `max_waves` bounds the loop (0 = run until interrupted)."""
    import sys
    import time

    import jax

    os.makedirs(out_dir, exist_ok=True)
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(out_dir, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without the persistent cache — waves still work

    hp, mean, std = _prepare_hp(models, batch, mesh, train_data)
    csv_path = os.path.join(out_dir, "scores.csv")
    # dedup keys are realpaths so a restart with a differently-spelled -d
    # (relative vs absolute, symlinked mount) does not rescore everything;
    # rows keep the as-listed path.
    scored = set()
    if os.path.exists(csv_path):  # resume an interrupted watch
        with open(csv_path, newline="") as f:
            rows = [r for r in csv.reader(f) if r]
        valid = []
        for r in rows[1:]:
            try:  # a torn final row (hard kill mid-write) must be rescored,
                float(r[1])  # not trusted — keep only well-formed rows
            except (IndexError, ValueError):
                continue
            valid.append(r)
            scored.add(os.path.realpath(r[0]))
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["path", "image_score"])
            w.writerows(valid)
    else:
        with open(csv_path, "w", newline="") as f:
            csv.writer(f).writerow(["path", "image_score"])

    def wave_rows(fresh, failures):
        """Score a wave; on failure (an image mid-copy or corrupt) fall back
        to per-file scoring so one bad file cannot drop the wave. Transient
        failures retry on later waves; after 3 strikes a NaN row is recorded
        so the watcher does not grind on a permanently corrupt file."""
        try:
            s = _score_files(models, fresh, hp, mean, std)
            assert len(s.image_scores) == len(fresh)
            return list(zip(fresh, [float(x) for x in s.image_scores]))
        except KeyboardInterrupt:
            raise
        except Exception:
            rows = []
            for p in fresh:
                try:
                    s = _score_files(models, [p], hp, mean, std)
                    rows.append((p, float(s.image_scores[0])))
                except KeyboardInterrupt:
                    raise
                except Exception as e:
                    key = os.path.realpath(p)
                    failures[key] = failures.get(key, 0) + 1
                    if failures[key] >= 3:
                        print(f"watch: giving up on {p!r} after 3 failed "
                              f"waves ({type(e).__name__}: {e})",
                              file=sys.stderr, flush=True)
                        rows.append((p, float("nan")))
            return rows

    summary = {"run": source, "images": len(scored), "waves": 0,
               "arch": hp.architecture, "model": hp.model_name}
    failures: dict = {}
    waves = 0
    while True:
        try:
            fresh = [p for p in list_images(images_dir)
                     if os.path.realpath(p) not in scored]
            if fresh:
                rows = wave_rows(fresh, failures)
                if rows:
                    with open(csv_path, "a", newline="") as f:
                        w = csv.writer(f)
                        for path, score in rows:
                            w.writerow([path, repr(score)])
                    scored.update(os.path.realpath(p) for p, _ in rows)
                    finite = [(p, x) for p, x in rows if np.isfinite(x)]
                    if finite:
                        top = max(finite, key=lambda r: r[1])
                        summary["last_wave"] = {
                            "n": len(rows), "score_max": top[1],
                            "top": top[0],
                        }
                        print(json.dumps(summary["last_wave"]), flush=True)
                summary["images"] = len(scored)
            waves += 1
            summary["waves"] = waves
            with open(os.path.join(out_dir, "summary.json"), "w") as f:
                json.dump(summary, f, indent=1)
            if max_waves and waves >= max_waves:
                return summary
            time.sleep(interval)
        except KeyboardInterrupt:
            # completed waves are already on disk; leave a final summary
            with open(os.path.join(out_dir, "summary.json"), "w") as f:
                json.dump(summary, f, indent=1)
            return summary


def _save_heatmaps(s, files, hp, mean, std, out_dir: str, n: int) -> None:
    """Overlay PNGs for the n highest-scoring images (the ones a production
    user triages first). Maps are display-normalized over the scored set so
    one color scale spans every PNG of the invocation."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vit_ad_tpu.data.dataset import AnomalyDataset

    hm_dir = os.path.join(out_dir, "heatmaps")
    os.makedirs(hm_dir, exist_ok=True)
    lo = float(s.pixel_scores.min())
    hi = float(s.pixel_scores.max())
    span = (hi - lo) or 1.0
    order = np.argsort(s.image_scores)[::-1][:n]
    ds = AnomalyDataset([files[i] for i in order], hp.img_size)  # images only
    for rank, i in enumerate(order):
        img = ds[rank]
        fig, ax = plt.subplots(figsize=(4, 4))
        ax.axis("off")
        ax.imshow(np.asarray(img).astype(np.uint8))
        ax.imshow((s.pixel_scores[i] - lo) / span, cmap="jet", vmin=0.0,
                  vmax=1.0, alpha=0.4)
        name = os.path.splitext(os.path.basename(files[i]))[0]
        fig.savefig(os.path.join(hm_dir, f"{rank:03d}_{name}.png"),
                    bbox_inches="tight", dpi=100)
        plt.close(fig)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="score a folder of images with a trained run or with "
                    "reference-format legacy .pth weights")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("-r", "--run",
                     help="run dir (config.json + best_params*)")
    src.add_argument("--pth", nargs="+", metavar="PTH",
                     help="reference-format .pth weights (two files = the "
                          "ResNet-MDN two-file convention); needs -a")
    ap.add_argument("-d", "--images", required=True,
                    help="directory of images to score (recursive)")
    ap.add_argument("-o", "--out", default="",
                    help="output dir (default <run>/scores)")
    ap.add_argument("--heatmaps", type=int, default=0,
                    help="save overlay PNGs for the N highest scores")
    ap.add_argument("-b", "--batch", type=int, default=0,
                    help="override the run's batch size")
    ap.add_argument("--train-data", default="",
                    help="training image dir (required for --centering runs)")
    ap.add_argument("--mesh", default="",
                    help="shard scoring batches over a device mesh, DxM or "
                         "'auto' (multi-chip serving; same flag as the "
                         "trainers)")
    ap.add_argument("--watch", type=float, default=0.0, metavar="SECS",
                    help="continuous serving: poll the images dir every "
                         "SECS seconds and score new images as they arrive "
                         "(appends to scores.csv; ctrl-C to stop)")
    ap.add_argument("--watch-waves", type=int, default=0,
                    help="stop --watch after N polls (0 = run forever)")
    # --pth mode only (mirrors validation_loop's legacy flags):
    ap.add_argument("-a", "--arch", default="",
                    help="mdn|nf|recon (with --pth)")
    ap.add_argument("-m", "--model", default="enc_deit",
                    help="encoder/AE registry key (with --pth)")
    ap.add_argument("-E", "--encoder-ckpt", default="",
                    help="pretrained trunk for legacy heads (with --pth)")
    ap.add_argument("-i", "--img-size", type=int, default=224)
    ap.add_argument("-f", "--flow-steps", type=int, default=20)
    ap.add_argument("--hidden-ratio", type=float, default=0.16)
    ap.add_argument("--weights-dtype", default="auto",
                    choices=("auto", "f32", "bf16"),
                    help="upload dtype for the restored weights (auto = "
                         "f32). bf16 halves the upload bytes but measured "
                         "SLOWER end-to-end on the one-shot wave and "
                         "drifts scores (tools/serving_bench.jsonl r5) — "
                         "strictly opt-in; prefer AOT bundles or --watch "
                         "for serving throughput")
    args = ap.parse_args(argv)
    # multi-host serving: connect before the backend initializes so --mesh
    # spans hosts (no-op unless the VITAD_* cluster env is set)
    from vit_ad_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    mesh = args.mesh
    if args.watch:
        if args.heatmaps:
            ap.error("--heatmaps is not supported with --watch (overlays "
                     "need the whole scored set for one color scale)")
        if args.pth:
            if not args.arch:
                ap.error("--pth needs -a <mdn|nf|recon>")
            models = _build_pth_models_cli(
                args.pth, args.arch, args.model, args.img_size,
                args.hidden_ratio, args.flow_steps, args.encoder_ckpt,
            )
            source = args.pth[0]
            out = args.out or os.path.splitext(args.pth[0])[0] + "_scores"
        else:
            from vit_ad_tpu.pipeline.loading import load_run

            models, _ = load_run(args.run)
            source = args.run
            out = args.out or os.path.join(args.run, "scores")
        # honor an explicit --weights-dtype here too (review r5: the watch
        # branch silently dropped it — the same silent-fallback class the
        # W_BLK fix addresses); auto resolves f32, so defaults are unchanged
        models = _maybe_compress(models, args.weights_dtype)
        summary = watch_folder(
            models, source, args.images, out, interval=args.watch,
            batch=args.batch, train_data=args.train_data, mesh=mesh,
            max_waves=args.watch_waves,
        )
        print(json.dumps(summary))
        return 0
    if args.pth:
        if not args.arch:
            ap.error("--pth needs -a <mdn|nf|recon>")
        summary = score_pth(
            args.pth, args.arch, args.images, out_dir=args.out or None,
            model_name=args.model, img_size=args.img_size,
            hidden_ratio=args.hidden_ratio, flow_steps=args.flow_steps,
            encoder_ckpt=args.encoder_ckpt, heatmaps=args.heatmaps,
            batch=args.batch, train_data=args.train_data, mesh=mesh,
            weights_dtype=args.weights_dtype,
        )
    else:
        summary = score_folder(
            args.run, args.images, out_dir=args.out or None,
            heatmaps=args.heatmaps, batch=args.batch,
            train_data=args.train_data, mesh=mesh,
            weights_dtype=args.weights_dtype,
        )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
