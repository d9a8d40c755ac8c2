"""Written proof: the reference's headline K=100 MDN-ResNet config FITS
under mixture-axis sharding at mesh 1x2 (round-3 VERDICT next-step 3).

Round 3 measured the single-chip OOM (16.83 GB needed vs 15.75 GB v5e HBM)
and *asserted* that `--mesh` model-axis sharding is the fix; round 4 adds
the single-chip K-chunked path (pipeline/mdn_chunked.py) AND this proof of
the sharded claim. The script:

  1. bootstraps a 2-device virtual CPU backend (1x2 mesh: pure
     mixture-axis sharding, no data parallelism — the hardest case for the
     capacity claim) in a subprocess;
  2. runs ONE real epoch of the REAL `train_mdn_resnet` (joint sharded
     step — VITAD_MDN_KCHUNK=0) at K=100 with the full-size [D,D,K] stage
     heads ([1024,1024,100] + [2048,2048,100]; head state is independent
     of image size, so a small image keeps the trunk cheap while the
     capacity-relevant tensors are the real ones);
  3. inspects the LIVE sharded arrays: every K-extent head leaf must be
     split K/2 per device, and the per-device standing bytes
     (params + Adam m/v + one gradient set, the same 4x multiplier that
     reproduced the measured 16.83 GB) must fit the 15.75 GB budget.

Writes tools/k100_mesh_proof.json. Run:
    VITAD_PLATFORM=cpu python tools/k100_mesh_proof.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
V5E_HBM = 15.75e9


def child() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import tempfile

    import numpy as np

    sys.path.insert(0, ROOT)
    from vit_ad_tpu.config import DtypePolicy, HyperParams, MeshConfig
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.pipeline.train import train_mdn_resnet

    assert len(jax.devices()) == 2, jax.devices()
    os.environ["VITAD_MDN_KCHUNK"] = "0"  # the JOINT sharded step is on trial
    # keep the best-weight snapshot as LIVE device arrays (the >1.5 GB tree
    # would otherwise take early_stopping's host path and hand back numpy,
    # losing the sharding this proof inspects)
    os.environ["VITAD_SNAPSHOT_DEVICE_MAX_MB"] = "1000000"

    img = 64
    hp = HyperParams(
        model_name="enc_res_net", architecture="mdn", epochs=1, patience=1,
        learning_rate=1e-3, batch_size=8, img_size=img, num_gaussians=100,
        seed=24, dtypes=DtypePolicy.f32(),
        mesh=MeshConfig(data=1, model=2),
    )
    with tempfile.TemporaryDirectory() as tmp:
        make_mvtec_category(tmp, "cat", img_size=img, n_train=10,
                            n_test_good=2, n_test_defect=2)
        data = DataPipeline(batch_size=8, base_path=tmp,
                            data_path="train/good", img_size=img)
        result = train_mdn_resnet(hp, data, None)
    loss = float(result.history["train_loss"][-1])
    assert np.isfinite(loss), loss

    # live shard inspection of the trained head tensors
    report = {"mesh": "1x2 (mixture axis only)", "num_gaussians": 100,
              "train_loss": loss, "leaves": [], }
    per_dev_param = 0
    heads = result.head_params["heads"]
    for si, head in enumerate(heads):
        for name, leaf in head["params"].items():
            shard = leaf.addressable_shards[0]
            entry = {
                "stage_head": si, "name": name,
                "global_shape": list(leaf.shape),
                "shard_shape": list(shard.data.shape),
                "k_split": (list(leaf.shape)[-1] != list(shard.data.shape)[-1]),
            }
            per_dev_param += int(np.prod(shard.data.shape)) * 4
            report["leaves"].append(entry)
            if name in ("w_sigma", "w_mu"):
                assert entry["k_split"], (
                    f"{name} stage {si} NOT split on K: {entry}"
                )
                assert entry["shard_shape"][-1] * 2 == entry["global_shape"][-1]
    # standing per-device state: params + Adam m + Adam v + one grad set
    per_dev_state = per_dev_param * 4
    report["per_device_head_param_bytes_gb"] = round(per_dev_param / 1e9, 3)
    report["per_device_standing_4x_gb"] = round(per_dev_state / 1e9, 3)
    report["v5e_hbm_budget_gb"] = V5E_HBM / 1e9
    report["fits"] = per_dev_state < V5E_HBM
    assert report["fits"], report
    with open(os.path.join(ROOT, "tools", "k100_mesh_proof.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "leaves"}))
    print("k100_mesh_proof OK")


def main() -> None:
    if os.environ.get("_K100_PROOF_CHILD") == "1":
        child()
        return
    env = dict(os.environ)
    env["_K100_PROOF_CHILD"] = "1"
    inherited = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    env["XLA_FLAGS"] = " ".join(
        inherited + ["--xla_force_host_platform_device_count=2"]
    )
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env, timeout=3600,
    )
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
