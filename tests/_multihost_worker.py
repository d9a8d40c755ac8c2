"""Worker process for tests/test_multihost.py: one host of a 2-process
distributed run (4 virtual CPU devices each → 4x2 global mesh), driving the
REAL train_nf product path end-to-end (training epochs + evaluation) and
printing its losses/metrics as JSON for the parent to compare.

Invoked with: python _multihost_worker.py <data_root> <workdir>
Env: VITAD_COORDINATOR / VITAD_NUM_PROCESSES / VITAD_PROCESS_ID (parent-set),
XLA_FLAGS --xla_force_host_platform_device_count=4.
"""

import json
import os
import sys

import jax

# the axon sitecustomize tramples JAX_PLATFORMS; force the virtual CPU
# backend post-import (CLAUDE.md rule 8)
jax.config.update("jax_platforms", "cpu")

from vit_ad_tpu.parallel.multihost import (  # noqa: E402
    is_primary,
    maybe_initialize_distributed,
)


def main() -> None:
    data_root, workdir = sys.argv[1], sys.argv[2]
    assert maybe_initialize_distributed(), "distributed init did not engage"
    assert jax.process_count() == 2
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np

    from vit_ad_tpu.config import DtypePolicy, HyperParams, MeshConfig
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.models.vit import ViTEncoder
    from vit_ad_tpu.pipeline.train import train_nf

    os.chdir(workdir)  # per-process dir: checkpoint writes are primary-only
    hp = HyperParams(
        architecture="nf", epochs=3, patience=3, learning_rate=1e-3,
        batch_size=8, img_size=32, hidden_ratio=1.0, flow_steps=2, seed=24,
        dtypes=DtypePolicy.f32(), mesh=MeshConfig(data=4, model=2),
    )
    encoder = ViTEncoder(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        num_prefix_tokens=2, dtypes=DtypePolicy.f32(),
    )
    data = DataPipeline(batch_size=8, base_path=data_root,
                        data_path="train/good", img_size=32)
    test = DataPipeline(batch_size=8, base_path=f"{data_root}/cat",
                        data_path="test", img_size=32, validation_mode=True)
    result = train_nf(hp, data, test, encoder=encoder)
    out = {
        "process": jax.process_index(),
        "primary": is_primary(),
        "train_loss": [float(x) for x in result.history["train_loss"]],
        "valid_loss": [float(x) for x in result.history["valid_loss"]],
        "image_auroc": float(result.metrics["image_auroc_score"]),
        "pixel_auroc": float(result.metrics["pixel_auroc_score"]),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
