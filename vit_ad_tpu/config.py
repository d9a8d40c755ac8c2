"""Configuration dataclasses.

Mirrors the de-facto config schema of the reference (`HyperParameterConfig`
TypedDict, reference src/pipeline/LearnerRecon.py:23-52, and `ValidationProps`,
reference src/util/ValidationHelper.py:16-28) as typed dataclasses, extended
with TPU-specific knobs (mesh shape, dtype policy, prefetch depth).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax.numpy as jnp

# ImageNet statistics, identical values to reference src/util/ModelHelper.py:5-6.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    """Numeric policy: params are kept in `param_dtype`, matmuls/convs run in
    `compute_dtype` (bf16 feeds the MXU at full rate), reductions and losses
    accumulate in `accum_dtype`."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    accum_dtype: Any = jnp.float32

    @staticmethod
    def f32() -> "DtypePolicy":
        return DtypePolicy(compute_dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh. `data` shards the batch, `model` shards params
    (tensor parallelism) for backbones too large for one chip's HBM. Sizes of
    -1 mean "use all remaining devices". The default (1, 1) disables mesh
    execution — trainers run plain single-device jit."""

    data: int = 1
    model: int = 1
    axis_names: Sequence[str] = ("data", "model")

    @property
    def requested(self) -> bool:
        """True when any axis asks for more than one device (or 'all')."""
        return self.data != 1 or self.model != 1

    @staticmethod
    def parse(spec: str) -> "MeshConfig":
        """Parse a CLI mesh spec: 'DxM' (e.g. '4x2'), a bare data size
        ('8'), or 'auto' (all devices on the data axis)."""
        spec = spec.strip().lower()
        if spec in ("auto", "all"):
            return MeshConfig(data=-1, model=1)
        if "x" in spec:
            d, m = spec.split("x", 1)
            return MeshConfig(data=int(d), model=int(m))
        return MeshConfig(data=int(spec), model=1)


@dataclasses.dataclass
class HyperParams:
    """Training hyper-parameters. Field names follow the reference's
    HyperParameterConfig (reference src/pipeline/LearnerRecon.py:23-52) so CLI
    plumbing and logged configs stay comparable."""

    # Model selection (keys of registry.MODEL_DICT).
    model_name: str = "ae_cnn"
    architecture: str = "reconstruction"  # reconstruction | mdn | nf
    # Optimization.
    epochs: int = 50
    patience: int = 30
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    batch_size: int = 64
    # Data.
    base_path: str = "data/mvtec"
    train_pref: str = "train/good"   # train-subdir suffix (CLI -t)
    valid_path: Optional[str] = None
    test_path: Optional[str] = None
    img_size: int = 224
    amount_data: int = 0  # 0 → all data (reference startTraining_*.py)
    centering: bool = False  # dataset-level standardization vs ImageNet stats
    dataset: str = "mvtec"
    data_class: str = ""
    # Head-specific.
    num_gaussians: int = 150          # MDN (reference startTraining_mdn.py:33)
    kmeans_init: bool = False         # MDN mu-bias KMeans seeding (reference
                                      # TrainingsHelper.init_cluster_centers)
    hidden_ratio: float = 0.16        # NF  (reference startTraining_NF.py:35)
    flow_steps: int = 20              # NF  (reference startTraining_NF.py:36)
    block_index: int = 0              # transformer feature depth (0 = last)
    # Loss weights for the SSIM recon variant (reference LearnerRecon.py:278).
    mse_weight: float = 5.0
    ssim_weight: float = 0.5
    # Eval.
    fp_threshold: float = 0.3
    # Reproducibility / TPU execution.
    seed: int = 24                    # matches reference file-shuffle seed
    dtypes: DtypePolicy = dataclasses.field(default_factory=DtypePolicy)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    cache_frozen_features: bool = True
    prefetch: int = 2
    log_dir: str = "runs"
    enable_wandb: bool = False

    def to_log_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d.pop("dtypes", None)
        d.pop("mesh", None)
        return d


@dataclasses.dataclass
class ValidationConfig:
    """Evaluation configuration (reference ValidationProps,
    src/util/ValidationHelper.py:16-28)."""

    dataset_name: str = "mvtec"
    fp_threshold: float = 0.3
    vmin: float = 0.0
    vmax: float = 1.0
    enable_wandb: bool = False
    batch_size: int = 32
    img_size: int = 224
