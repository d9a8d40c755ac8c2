"""Model factory.

Parity with reference `MODEL_DICT` / `get_model` (reference
src/util/ModelHelper.py:8-70): same 22 string keys, same semantics — `enc_*`
returns a bare (frozen) encoder, `ae_*` an auto-encoder whose decoder defaults
to the ResNet-style decoder for transformer backbones and to the small conv
decoder when the key ends in `_small` (ModelHelper.py:52-58).

Builders are resolved lazily so each model family lives in its own module.
"""

from __future__ import annotations

from typing import Callable, Dict

from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy

_BUILDERS: Dict[str, Callable[..., nn.Module]] = {}


def _register(name: str):
    def deco(fn):
        _BUILDERS[name] = fn
        return fn

    return deco


# --- encoders -------------------------------------------------------------

@_register("enc_deit")
def _enc_deit(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.vit import deit_base_distilled_patch16

    return deit_base_distilled_patch16(img_size, dtypes)


@_register("enc_vit")
def _enc_vit(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.vit import vit_base_patch16

    return vit_base_patch16(img_size, dtypes)


@_register("enc_esvit")
def _enc_esvit(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.swin import esvit_swin_tiny

    return esvit_swin_tiny(img_size, dtypes)


@_register("enc_nest")
def _enc_nest(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.nest import nest_tiny

    return nest_tiny(img_size, dtypes)


@_register("enc_eff_former")
def _enc_eff_former(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.efficientformer import efficientformer_l3

    return efficientformer_l3(img_size, dtypes)


@_register("enc_cnn")
def _enc_cnn(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.cnn import VanillaCNNEncoder

    return VanillaCNNEncoder(img_size=img_size, dtypes=dtypes)


@_register("enc_res_net")
def _enc_res_net(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.resnet import ResNetEncoder

    return ResNetEncoder(img_size=img_size, dtypes=dtypes)


@_register("enc_eff_net")
def _enc_eff_net(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.efficientnet import EfficientNetEncoder

    return EfficientNetEncoder(img_size=img_size, dtypes=dtypes)


# --- auto-encoders ----------------------------------------------------------

def _make_ae(encoder_key: str, decoder: str):
    def build(img_size: int, dtypes: DtypePolicy) -> nn.Module:
        from vit_ad_tpu.models.autoencoder import TransformerAutoEncoder

        return TransformerAutoEncoder(
            encoder=_BUILDERS[encoder_key](img_size, dtypes),
            decoder_kind=decoder,
            img_size=img_size,
            dtypes=dtypes,
        )

    return build


for _k in ("deit", "vit", "esvit", "nest", "eff_former"):
    _BUILDERS[f"ae_{_k}"] = _make_ae(f"enc_{_k}", "resnet")
    _BUILDERS[f"ae_{_k}_small"] = _make_ae(f"enc_{_k}", "cnn")


@_register("ae_cnn")
def _ae_cnn(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.autoencoder import VanillaAutoEncoder

    return VanillaAutoEncoder(img_size=img_size, dtypes=dtypes)


@_register("ae_res_net")
def _ae_res_net(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.autoencoder import ResNetAutoEncoder

    return ResNetAutoEncoder(img_size=img_size, dtypes=dtypes, small_decoder=False)


@_register("ae_res_net_small")
def _ae_res_net_small(img_size: int, dtypes: DtypePolicy) -> nn.Module:
    from vit_ad_tpu.models.autoencoder import ResNetAutoEncoder

    return ResNetAutoEncoder(img_size=img_size, dtypes=dtypes, small_decoder=True)


MODEL_DICT = _BUILDERS  # reference-compatible alias (ModelHelper.py:8-30)


def get_model(
    name: str, img_size: int = 224, dtypes: DtypePolicy | None = None
) -> nn.Module:
    """Build a model by registry key (reference ModelHelper.py:33-65).

    `requires_grad` from the reference is not a constructor concern here:
    frozen-ness is a property of the training step (the optimizer only sees
    head params; see pipeline/), which is the JAX-native way to freeze."""
    if name not in _BUILDERS:
        raise KeyError(
            f"Unknown model '{name}'. Available: {get_possible_models()}"
        )
    return _BUILDERS[name](img_size, dtypes or DtypePolicy())


def get_possible_models() -> list[str]:
    return sorted(_BUILDERS.keys())
