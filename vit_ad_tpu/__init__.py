"""vit-ad-tpu: a TPU-native (JAX/XLA/Pallas/pjit) visual anomaly-detection framework.

Re-implements the capabilities of the reference `Miwri/vit-ad` codebase (frozen
pretrained vision backbones + three anomaly heads — reconstruction, Gaussian
mixture density, normalizing flow — trained per-category on MVTecAD / BTAD
"good" images, evaluated with image/pixel AUROC, PRAUC, PRO) as an idiomatic
TPU-first framework:

  * models/   — flax.linen backbones (DeiT, ViT, EsViT Swin-T, NesT,
                EfficientFormer, ResNet-50, EfficientNet-style, vanilla CNN)
                and heads (conv decoders, MDN/GMM, FastFlow-style NF).
  * ops/      — compute kernels: Pallas TPU kernels for the hot paths
                (windowed MHSA, GMM log-likelihood) with XLA reference
                implementations; SSIM, bilinear resize matching torch.
  * data/     — MVTec/BTAD directory-contract datasets, host decode +
                on-device preprocessing, double-buffered prefetch.
  * pipeline/ — jit-compiled train/eval steps, feature caching for frozen
                encoders, metrics engine (AUROC/PRAUC/PRO), early stopping,
                sweep runner.
  * parallel/ — mesh construction, sharding rules, multi-chip train steps.
  * utils/    — Orbax checkpointing, torch→JAX weight conversion, pluggable
                metric logging, plotting.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("VITAD_PLATFORM"):
    # Uniform platform override for the CLIs: some PJRT plugins (e.g. the
    # axon TPU tunnel) register via sitecustomize and trample JAX_PLATFORMS,
    # so an env-var the library applies post-import is the only reliable way
    # to force e.g. a virtual CPU mesh for CLI runs (tests do the same in
    # conftest.py).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VITAD_PLATFORM"])

from vit_ad_tpu.config import HyperParams, ValidationConfig  # noqa: F401

# Registry exports are lazy (PEP 562): `registry` pulls the whole flax model
# zoo, and serving sites that only load an AOT bundle
# (vit_ad_tpu.serving.aot) must not pay that import — their scoring path
# needs jax + numpy only (tests/test_serving_export.py locks this).
_LAZY = {
    "MODEL_DICT": "vit_ad_tpu.registry",
    "get_model": "vit_ad_tpu.registry",
    "get_possible_models": "vit_ad_tpu.registry",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        val = getattr(importlib.import_module(_LAZY[name]), name)
        globals()[name] = val
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
