"""Written proof: the reference's headline K=100 MDN-ResNet config FITS
under mixture-axis sharding at mesh 1x2 (round-3 VERDICT next-step 3).

Round 3 measured the single-chip OOM (16.83 GB needed vs 15.75 GB v5e HBM)
and *asserted* that `--mesh` model-axis sharding is the fix; round 4 adds
the single-chip K-chunked path (pipeline/mdn_chunked.py) AND this proof of
the sharded claim, in two parts:

  1. LAYOUT (collective-free, deterministic): build the K=100 stage heads
     exactly as `train_mdn_resnet` does, shard them through the trainer's
     own `MeshContext.shard_params` on a 1x2 (mixture-axis-only) mesh, and
     inspect the LIVE arrays: every [D,D,K] leaf must hold K/2 per device,
     and the per-device standing bytes (params + Adam m/v + one gradient
     set — the same 4x multiplier that reproduces the measured 16.83 GB
     unsharded) must fit the 15.75 GB budget.
  2. EXECUTION: one real epoch of `train_mdn_resnet` at K=100 under the
     same mesh (joint sharded step, VITAD_MDN_KCHUNK=0), finite loss.
     XLA:CPU in-process collectives on this 1-core box sit at the edge of
     the runtime's hard 40 s rendezvous timeout, so this leg retries and
     reports honestly either way (it is an environment scheduling
     limitation — the same trainers' mesh semantics are certified by
     tests/test_mesh_training.py and the 2-process gloo run in
     tests/test_multihost.py).

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


def _layout_report():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_ad_tpu.config import DtypePolicy, HyperParams, MeshConfig
    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.models.resnet import STAGE_CHANNELS
    from vit_ad_tpu.parallel.context import MeshContext

    hp = HyperParams(
        model_name="enc_res_net", architecture="mdn", num_gaussians=100,
        dtypes=DtypePolicy.f32(), mesh=MeshConfig(data=1, model=2),
    )
    mc = MeshContext.from_hp(hp)
    assert mc is not None
    stages = (2, 3)
    rng = jax.random.key(hp.seed)
    head_params = []
    for i in stages:
        rng, k = jax.random.split(rng)
        mdn = GaussianMDN(features=STAGE_CHANNELS[i],
                          num_gaussians=hp.num_gaussians)
        head_params.append(
            mdn.init(k, jnp.zeros((1, 1, STAGE_CHANNELS[i])))
        )
    # the trainer's own sharding entry point (train.py train_mdn_resnet)
    sharded = mc.shard_params({"heads": head_params})

    report = {"mesh": "1x2 (mixture axis only)", "num_gaussians": 100,
              "leaves": []}
    per_dev_param = 0
    for si, head in enumerate(sharded["heads"]):
        for name, leaf in head["params"].items():
            shard = leaf.addressable_shards[0]
            entry = {
                "stage_head": si, "name": name,
                "global_shape": list(leaf.shape),
                "shard_shape": list(shard.data.shape),
            }
            per_dev_param += int(np.prod(shard.data.shape)) * 4
            report["leaves"].append(entry)
            if name in ("w_sigma", "w_mu", "b_sigma", "b_mu"):
                assert entry["shard_shape"][-1] * 2 == entry["global_shape"][-1], (
                    f"{name} stage {si} NOT split on K: {entry}"
                )
    per_dev_state = per_dev_param * 4  # params + m + v + grads
    report["per_device_head_param_bytes_gb"] = round(per_dev_param / 1e9, 3)
    report["per_device_standing_4x_gb"] = round(per_dev_state / 1e9, 3)
    report["unsharded_standing_4x_gb"] = round(per_dev_param * 2 * 4 / 1e9, 3)
    report["v5e_hbm_budget_gb"] = V5E_HBM / 1e9
    report["fits"] = per_dev_state < V5E_HBM
    assert report["fits"], report
    return report


def _execution_report():
    import tempfile

    import numpy as np

    from vit_ad_tpu.config import DtypePolicy, HyperParams, MeshConfig
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.pipeline.train import train_mdn_resnet

    os.environ["VITAD_MDN_KCHUNK"] = "0"  # the JOINT sharded step on trial
    img = 32
    hp = HyperParams(
        model_name="enc_res_net", architecture="mdn", epochs=1, patience=1,
        learning_rate=1e-3, batch_size=4, img_size=img, num_gaussians=100,
        seed=24, dtypes=DtypePolicy.f32(), mesh=MeshConfig(data=1, model=2),
    )
    with tempfile.TemporaryDirectory() as tmp:
        make_mvtec_category(tmp, "cat", img_size=img, n_train=6,
                            n_test_good=2, n_test_defect=2)
        data = DataPipeline(batch_size=4, base_path=tmp,
                            data_path="train/good", img_size=img)
        result = train_mdn_resnet(hp, data, None)
    loss = float(result.history["train_loss"][-1])
    assert np.isfinite(loss), loss
    return {"ok": True, "train_loss": loss}


def child() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ROOT)
    assert len(jax.devices()) == 2, jax.devices()

    mode = os.environ.get("_K100_PROOF_MODE", "layout")
    if mode == "layout":
        report = _layout_report()
        with open(os.path.join(ROOT, "tools", "k100_mesh_proof.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps({k: v for k, v in report.items() if k != "leaves"}))
    else:
        print(json.dumps(_execution_report()))


def _spawn(mode: str, timeout: int) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["_K100_PROOF_CHILD"] = "1"
    env["_K100_PROOF_MODE"] = mode
    inherited = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    env["XLA_FLAGS"] = " ".join(
        inherited + ["--xla_force_host_platform_device_count=2"]
    )
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env, timeout=timeout,
    )


def main() -> None:
    if os.environ.get("_K100_PROOF_CHILD") == "1":
        child()
        return
    rc = _spawn("layout", 1800).returncode
    if rc != 0:
        sys.exit(rc)
    # execution leg: retried — XLA:CPU in-process collectives on a 1-core
    # host intermittently hit the runtime's hard 40 s rendezvous abort
    exec_ok, attempts = False, 0
    for attempts in (1, 2, 3):
        if _spawn("exec", 2400).returncode == 0:
            exec_ok = True
            break
    path = os.path.join(ROOT, "tools", "k100_mesh_proof.json")
    with open(path) as f:
        report = json.load(f)
    report["execution"] = {"ok": exec_ok, "attempts": attempts,
                           "note": "train_mdn_resnet K=100 mesh 1x2, 1 epoch"
                           " (CPU-collective rendezvous flakiness retried)"}
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["execution"]))
    sys.exit(0 if exec_ok else 1)


if __name__ == "__main__":
    main()
