"""Epoch-level training throughput of the REAL trainers (scan vs loop).

tools/bench_train.py measures the jit STEP in isolation; this measures what
a user's training run actually achieves per epoch — including the host
epoch loop, dispatch scheduling, and loss fetching — by timing the product
trainer at two different epoch counts and taking the slope:

    per-epoch seconds = (T(e2) - T(e1)) / (e2 - e1)

which cancels every one-time cost (compiles, feature extraction, staging).
Each timing runs in a FRESH subprocess: within one process, a second
trainer call does not repay the first call's one-time costs (measured:
re-running the same trainer compiles ~10 s faster, flipping the slope
negative), so same-process two-run slopes are invalid. Sequential children
also honor the ONE-TPU-process rule. Run for VITAD_SCAN_EPOCH=1 (one
lax.scan dispatch per epoch, the default) and =0 (per-step loop) to
quantify the scan-epoch win on the attached TPU.

    python tools/bench_epoch.py --which mdn,nf --n-train 160 --batch 32
    # also: recon (ae_deit), vae, mdn_resnet, nf_resnet (image-batch scans)

axon rules apply (PERF.md): init on CPU, run children to completion (no
killing timeouts). Writes tools/epoch_bench.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT_PATH = os.path.join(ROOT, "tools", "epoch_bench.json")

TRAINER_SPECS = {
    # which -> (trainer attr, architecture, model_name)
    "mdn": ("train_mdn", "mdn", "enc_deit"),
    "nf": ("train_nf", "nf", "enc_deit"),
    "recon": ("train_recon", "reconstruction", "ae_deit"),
    "vae": ("train_vae", "reconstruction", "ae_cnn"),
    "mdn_resnet": ("train_mdn_resnet", "mdn", "enc_res_net"),
    "nf_resnet": ("train_nf_resnet", "nf", "enc_res_net"),
}


def _child(args) -> None:
    """One timed trainer call; prints a single JSON line with wall seconds
    of the train phase (data staging included — it is one-time and the
    slope cancels it)."""
    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.pipeline import train as T

    attr, arch, model_name = TRAINER_SPECS[args.which]
    hp = HyperParams(
        model_name=model_name, architecture=arch, batch_size=args.batch,
        img_size=args.img_size, num_gaussians=args.gaussians,
        flow_steps=args.flow_steps, hidden_ratio=0.16, learning_rate=1e-3,
        weight_decay=1e-5, seed=24, epochs=args.epochs, patience=args.epochs,
    )
    data = DataPipeline(batch_size=args.batch, base_path=args.data_dir,
                        data_path="train/good", img_size=args.img_size)
    t0 = time.perf_counter()
    getattr(T, attr)(hp, data, None)
    print(json.dumps({"seconds": time.perf_counter() - t0}), flush=True)


def _time_in_subprocess(argv_base, which, epochs, scan_mode) -> float:
    env = dict(os.environ)
    env["VITAD_SCAN_EPOCH"] = scan_mode
    env.setdefault("PYTHONPATH", f"{ROOT}:/root/.axon_site")
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--which", which, "--epochs", str(epochs)] + argv_base
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"child failed rc={proc.returncode}:\n{proc.stderr[-2000:]}"
        )
    return float(json.loads(proc.stdout.strip().splitlines()[-1])["seconds"])


def bench(args, which):
    import tempfile

    from vit_ad_tpu.data.synthetic import make_mvtec_category

    data_dir = args.data_dir
    if data_dir is None:
        data_dir = tempfile.mkdtemp()
        make_mvtec_category(data_dir, "bench", img_size=args.img_size,
                            n_train=args.n_train, n_test_good=2,
                            n_test_defect=2)
    argv_base = [
        "--data-dir", data_dir, "--n-train", str(args.n_train),
        "--batch", str(args.batch), "--img-size", str(args.img_size),
        "--gaussians", str(args.gaussians),
        "--flow-steps", str(args.flow_steps),
    ]
    out = {}
    for mode, label in (("1", "scan"), ("0", "loop")):
        # warmup child: the axon endpoint caches compiles ACROSS processes
        # (keyed by HLO), so after any code change the first timed child
        # would pay a fresh compile its sibling then gets for free — the
        # slope goes negative (measured: mdn scan 409 s @6 epochs then
        # 115 s @30). One discarded child warms the cache for both.
        t_warm = _time_in_subprocess(argv_base, which, 1, mode)
        print(json.dumps({"which": which, "mode": label,
                          "warmup_s": round(t_warm, 2)}), flush=True)
        t_short = _time_in_subprocess(argv_base, which, args.e1, mode)
        t_long = _time_in_subprocess(argv_base, which, args.e2, mode)
        per_epoch = (t_long - t_short) / (args.e2 - args.e1)
        out[label] = {
            "sec_per_epoch": round(per_epoch, 4),
            "img_per_sec": round(args.n_train / per_epoch, 1),
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
    ap.add_argument("--data-dir", default=None,
                    help="existing category dir (child runs require it)")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--epochs", type=int, default=0, help="child only")
    args = ap.parse_args()

    if args.child:
        _child(args)
        return

    results = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            results = json.load(f)
    for which in args.which.split(","):
        key = f"{which}_b{args.batch}_n{args.n_train}"
        results[key] = bench(args, which)
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
