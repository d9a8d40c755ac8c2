"""Multi-host (pod-scale) training certification: two REAL separate
processes, 4 virtual CPU devices each, form one global 4x2 mesh via
jax.distributed (Gloo collectives) and run the product train_nf path —
training epochs, TP-sharded params, early-stopping host snapshots
(allgather-aware), evaluation with data-sharded payload fetches — then the
results are compared across processes and against a single-process
8-device run of the identical config.

The reference is strictly single-device; SURVEY.md §2.8 reserves scale-out
as a supported axis of the rebuild. This is the cross-HOST leg the
single-process mesh tests cannot cover: every collective here actually
crosses a process boundary.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(data_root: str, tmp_path) -> list:
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["VITAD_COORDINATOR"] = f"127.0.0.1:{port}"
        env["VITAD_NUM_PROCESSES"] = "2"
        env["VITAD_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = ROOT
        wd = tmp_path / f"proc{pid}"
        wd.mkdir()
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, data_root, str(wd)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        line = [l for l in stdout.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{stdout[-1500:]}\n{stderr[-1500:]}"
        outs.append(json.loads(line[-1][len("RESULT "):]))
    return outs


def _single_process_reference(data_root: str, tmp_path):
    """The identical config on one process with 8 local virtual devices."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("VITAD_COORDINATOR", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = ROOT
    wd = tmp_path / "single"
    wd.mkdir()
    code = f"""
import jax, json
jax.config.update("jax_platforms", "cpu")
import os
os.chdir({str(wd)!r})
from vit_ad_tpu.config import DtypePolicy, HyperParams, MeshConfig
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.models.vit import ViTEncoder
from vit_ad_tpu.pipeline.train import train_nf
hp = HyperParams(architecture="nf", epochs=3, patience=3, learning_rate=1e-3,
                 batch_size=8, img_size=32, hidden_ratio=1.0, flow_steps=2,
                 seed=24, dtypes=DtypePolicy.f32(),
                 mesh=MeshConfig(data=4, model=2))
encoder = ViTEncoder(img_size=32, patch_size=8, embed_dim=64, depth=2,
                     num_heads=4, num_prefix_tokens=2, dtypes=DtypePolicy.f32())
data = DataPipeline(batch_size=8, base_path={data_root!r},
                    data_path="train/good", img_size=32)
test = DataPipeline(batch_size=8, base_path={data_root!r} + "/cat",
                    data_path="test", img_size=32, validation_mode=True)
r = train_nf(hp, data, test, encoder=encoder)
print("RESULT " + json.dumps({{
    "train_loss": [float(x) for x in r.history["train_loss"]],
    "valid_loss": [float(x) for x in r.history["valid_loss"]],
    "image_auroc": float(r.metrics["image_auroc_score"]),
    "pixel_auroc": float(r.metrics["pixel_auroc_score"]),
}}))
"""
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, f"single-process run failed:\n{p.stderr[-3000:]}"
    line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
    return json.loads(line[-1][len("RESULT "):])


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    from vit_ad_tpu.data.synthetic import make_mvtec_category

    root = tmp_path_factory.mktemp("mvtec_mh")
    make_mvtec_category(str(root), "cat", img_size=32, n_train=16,
                        n_test_good=4, n_test_defect=4)
    return str(root)


def test_checkpoint_writes_are_primary_gated(monkeypatch):
    """EarlyStopping snapshots on every process (identical host pytrees)
    but only the primary writes them to disk — shared checkpoint dirs on a
    pod must not race."""
    from vit_ad_tpu.pipeline.early_stopping import EarlyStopping

    saved = []
    stopper = EarlyStopping(patience=2, save_fn=lambda p, e, l: saved.append(e))
    monkeypatch.setattr("vit_ad_tpu.parallel.multihost.is_primary",
                        lambda: False)
    stopper.update(1.0, {"w": np.zeros(2)}, epoch=0)
    assert stopper.best_epoch == 0 and saved == []  # snapshot yes, write no
    monkeypatch.setattr("vit_ad_tpu.parallel.multihost.is_primary",
                        lambda: True)
    stopper.update(0.5, {"w": np.zeros(2)}, epoch=1)
    assert saved == [1]


def test_two_process_train_nf_matches_single_process(category, tmp_path):
    a, b = _run_workers(category, tmp_path)
    assert {a["process"], b["process"]} == {0, 1}
    assert a["primary"] != b["primary"] or a["process"] == 0

    # both processes compute identical results (same SPMD program)
    np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                               rtol=1e-6, atol=1e-8)
    assert a["image_auroc"] == b["image_auroc"]

    # and the 2-process global mesh reproduces the single-process 8-device
    # run of the same config (same shardings; Gloo reduction order may
    # differ from single-process XLA, and the flow couplings are convs —
    # see the conv-recompilation note in PERF.md — hence tolerances)
    ref = _single_process_reference(category, tmp_path)
    np.testing.assert_allclose(a["train_loss"], ref["train_loss"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(a["valid_loss"], ref["valid_loss"],
                               rtol=1e-4, atol=1e-6)
    assert a["image_auroc"] == pytest.approx(ref["image_auroc"], abs=1e-6)
