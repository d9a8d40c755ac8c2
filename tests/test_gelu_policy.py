"""Lock the shared GELU-flavor policy (models/layers.resolve_gelu_approx).

Every backbone must follow it: tanh approximation under bf16 compute (no
`erf` in the traced forward), exact erf under f32 (converter/torch-parity
paths) and under VITAD_EXACT_GELU=1. The erf primitive in the jaxpr is the
observable — the tanh approximation lowers to tanh/mul/add only.
"""

import jax
import jax.numpy as jnp
import pytest

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.efficientformer import EfficientFormer
from vit_ad_tpu.models.layers import resolve_gelu_approx
from vit_ad_tpu.models.nest import NesT
from vit_ad_tpu.models.swin import SwinTransformer
from vit_ad_tpu.models.vit import deit_base_distilled_patch16

F32 = DtypePolicy.f32()
BF16 = DtypePolicy()  # compute bf16 default


def _jaxpr_has_erf(model, x, **apply_kw):
    v = jax.eval_shape(
        lambda k: model.init(k, x, **apply_kw), jax.random.key(0)
    )
    closed = jax.make_jaxpr(
        lambda vv, xx: model.apply(vv, xx, **apply_kw)
    )(v, x)
    return "erf" in str(closed)


def test_resolve_gelu_approx_policy(monkeypatch):
    monkeypatch.delenv("VITAD_EXACT_GELU", raising=False)
    assert resolve_gelu_approx(BF16) is True
    assert resolve_gelu_approx(F32) is False
    assert resolve_gelu_approx(BF16, gelu_tanh=False) is False
    assert resolve_gelu_approx(F32, gelu_tanh=True) is True
    monkeypatch.setenv("VITAD_EXACT_GELU", "1")
    assert resolve_gelu_approx(BF16) is False
    assert resolve_gelu_approx(BF16, gelu_tanh=True) is False


@pytest.mark.parametrize(
    "build",
    [
        lambda dt: (
            EfficientFormer(
                img_size=64, dims=(8, 16, 24, 32), depths=(1, 1, 2, 2),
                vit_num=1, num_heads=2, dtypes=dt,
            ),
            {"train": False},
        ),
        lambda dt: (
            NesT(
                img_size=32, patch_size=4, embed_dims=(16, 32),
                num_heads=(2, 4), depths=(1, 1), dtypes=dt,
            ),
            {},
        ),
        lambda dt: (
            SwinTransformer(
                img_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
                num_heads=(2, 4), window=4, dtypes=dt,
            ),
            {},
        ),
    ],
    ids=["efficientformer", "nest", "swin"],
)
def test_backbones_follow_gelu_policy(build, monkeypatch):
    monkeypatch.delenv("VITAD_EXACT_GELU", raising=False)
    model_bf16, kw = build(BF16)
    img = model_bf16.img_size
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    assert not _jaxpr_has_erf(model_bf16, x, **kw), "bf16 must use tanh GELU"
    model_f32, kw = build(F32)
    assert _jaxpr_has_erf(model_f32, x, **kw), "f32 must keep exact erf"
    monkeypatch.setenv("VITAD_EXACT_GELU", "1")
    assert _jaxpr_has_erf(model_bf16, x, **kw), "env pin must restore erf"


def test_vit_follows_shared_policy(monkeypatch):
    monkeypatch.delenv("VITAD_EXACT_GELU", raising=False)
    m = deit_base_distilled_patch16(img_size=32, dtypes=BF16)
    # shrink: deit builder may not take depth overrides; trace at img 32
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    assert not _jaxpr_has_erf(m, x)
    m32 = deit_base_distilled_patch16(img_size=32, dtypes=F32)
    assert _jaxpr_has_erf(m32, x)
