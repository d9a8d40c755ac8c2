"""Epoch-level training throughput of the REAL trainers (scan vs loop).

tools/bench_train.py measures the jit STEP in isolation; this measures what
a user's training run actually achieves per epoch — including the host
epoch loop, dispatch scheduling, and loss fetching — by timing the product
`train_mdn` / `train_nf` twice with different epoch counts and taking the
slope:

    per-epoch seconds = (T(e2) - T(e1)) / (e2 - e1)

which cancels every one-time cost (compiles, feature extraction, staging,
final evaluation). Run for VITAD_SCAN_EPOCH=1 (one lax.scan dispatch per
epoch, the default) and =0 (per-step loop) to quantify the scan-epoch win
on the attached TPU.

    python tools/bench_epoch.py --which mdn,nf --n-train 160 --batch 32
    # also: recon (ae_deit), vae, mdn_resnet, nf_resnet (image-batch scans)

axon rules apply (PERF.md): ONE process on the chip, init on CPU, run to
completion (no killing timeouts). Writes tools/epoch_bench.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT_PATH = os.path.join(ROOT, "tools", "epoch_bench.json")


def _make_data(tmp, n_train, img_size, batch):
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.data.synthetic import make_mvtec_category

    make_mvtec_category(tmp, "bench", img_size=img_size, n_train=n_train,
                        n_test_good=2, n_test_defect=2)
    data = DataPipeline(batch_size=batch, base_path=tmp,
                        data_path="train/good", img_size=img_size)
    return data


def _run(trainer, hp, data, epochs):
    """One full trainer call at `epochs`; returns wall seconds. test_data
    None → no eval; patience=epochs → never early-stops."""
    import dataclasses

    hp = dataclasses.replace(hp, epochs=epochs, patience=epochs)
    t0 = time.perf_counter()
    trainer(hp, data, None)
    return time.perf_counter() - t0


def bench(which, n_train, batch, img_size, e1, e2, gaussians, flow_steps):
    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.pipeline import train as T

    trainers = {
        "mdn": T.train_mdn, "nf": T.train_nf,
        "recon": T.train_recon, "vae": T.train_vae,
        "mdn_resnet": T.train_mdn_resnet, "nf_resnet": T.train_nf_resnet,
    }
    arch = {"recon": "reconstruction", "vae": "reconstruction"}.get(
        which, which.split("_")[0]
    )
    model_name = (
        "ae_deit" if which == "recon"
        else "enc_res_net" if which.endswith("_resnet")
        else "enc_deit"
    )
    hp = HyperParams(
        model_name=model_name, architecture=arch, batch_size=batch,
        img_size=img_size, num_gaussians=gaussians, flow_steps=flow_steps,
        hidden_ratio=0.16, learning_rate=1e-3, weight_decay=1e-5, seed=24,
    )
    import tempfile

    tmp = tempfile.mkdtemp()
    data = _make_data(tmp, n_train, img_size, batch)

    out = {}
    for mode, label in (("1", "scan"), ("0", "loop")):
        os.environ["VITAD_SCAN_EPOCH"] = mode
        t_short = _run(trainers[which], hp, data, e1)
        t_long = _run(trainers[which], hp, data, e2)
        per_epoch = (t_long - t_short) / (e2 - e1)
        out[label] = {
            "sec_per_epoch": round(per_epoch, 4),
            "img_per_sec": round(n_train / per_epoch, 1),
            "t_short_s": round(t_short, 2),
            "t_long_s": round(t_long, 2),
        }
        print(json.dumps({"which": which, "mode": label, **out[label]}),
              flush=True)
    out["speedup_scan_vs_loop"] = round(
        out["loop"]["sec_per_epoch"] / out["scan"]["sec_per_epoch"], 3
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="mdn,nf")
    ap.add_argument("--n-train", type=int, default=160)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--e1", type=int, default=6)
    ap.add_argument("--e2", type=int, default=30)
    ap.add_argument("--gaussians", type=int, default=100)
    ap.add_argument("--flow-steps", type=int, default=20)
    args = ap.parse_args()

    results = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            results = json.load(f)
    for which in args.which.split(","):
        key = f"{which}_b{args.batch}_n{args.n_train}"
        results[key] = bench(
            which, args.n_train, args.batch, args.img_size,
            args.e1, args.e2, args.gaussians, args.flow_steps,
        )
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
