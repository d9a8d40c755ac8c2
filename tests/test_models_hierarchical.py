"""Shape tests for the hierarchical backbones (NesT, EfficientFormer) and
registry coverage of all 21 reference MODEL_DICT keys."""

import jax
import jax.numpy as jnp
import pytest

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.efficientformer import EfficientFormer
from vit_ad_tpu.models.nest import NesT
from vit_ad_tpu.registry import get_possible_models

F32 = DtypePolicy.f32()


def test_nest_tiny_shapes():
    # small config: img 32, patch 4 → 8x8 grid, 2 levels → final 4x4
    m = NesT(img_size=32, patch_size=4, embed_dims=(16, 32), num_heads=(2, 4),
             depths=(1, 1), dtypes=F32)
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.patch_embedding.shape == (2, 16, 32)
    assert out.latent.shape == (2, 32)


def test_nest_full_config_shapes():
    m = NesT(img_size=224, dtypes=F32)
    shapes = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 224, 224, 3))), jax.random.key(0)
    )
    out = jax.eval_shape(m.apply, shapes, jnp.zeros((1, 224, 224, 3)))
    # reference: emb 384, 196 patches at /16 (TransformerEncoder.py:59-61)
    assert out.patch_embedding.shape == (1, 196, 384)
    assert out.latent.shape == (1, 384)


def test_efficientformer_shapes():
    m = EfficientFormer(img_size=64, dims=(8, 16, 24, 32), depths=(1, 1, 2, 2),
                        vit_num=1, dtypes=F32)
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.key(0), x, train=True)
    out = m.apply(v, x, train=False)
    assert out.patch_embedding.shape == (2, 4, 32)  # 64/32=2 → 2x2
    assert out.latent.shape == (2, 32)


def test_efficientformer_l3_config_shapes():
    m = EfficientFormer(img_size=224, dtypes=F32)
    shapes = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 224, 224, 3)), train=False),
        jax.random.key(0),
    )
    out = jax.eval_shape(
        lambda v, x: m.apply(v, x, train=False), shapes, jnp.zeros((1, 224, 224, 3))
    )
    # reference: emb 512, 49 patches at /32 (TransformerEncoder.py:98-99)
    assert out.patch_embedding.shape == (1, 49, 512)
    assert out.latent.shape == (1, 512)


def test_registry_covers_reference_model_dict():
    """All 21 keys of reference MODEL_DICT (ModelHelper.py:8-30)."""
    reference_keys = {
        "enc_cnn", "enc_eff_net", "enc_res_net", "enc_nest", "enc_eff_former",
        "enc_deit", "enc_vit", "enc_esvit",
        "ae_cnn", "ae_res_net", "ae_res_net_small",
        "ae_nest", "ae_eff_former", "ae_deit", "ae_vit", "ae_esvit",
        "ae_nest_small", "ae_eff_former_small", "ae_deit_small",
        "ae_vit_small", "ae_esvit_small",
    }
    assert reference_keys <= set(get_possible_models())


def test_all_registry_models_shape_check():
    """eval_shape smoke over every reference MODEL_DICT key at 224px —
    catches wiring errors across the whole zoo without running compute."""
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.registry import get_model, get_possible_models

    x = jnp.zeros((1, 224, 224, 3))
    for name in get_possible_models():
        model = get_model(name, img_size=224, dtypes=F32)
        kwargs = {}
        try:
            shapes = jax.eval_shape(
                lambda k: model.init(k, x, train=True)
                if name.startswith("ae_") or name in ("enc_cnn", "enc_res_net", "enc_eff_net", "enc_eff_former")
                else model.init(k, x),
                jax.random.key(0),
            )
        except TypeError:
            shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
        assert shapes, name
