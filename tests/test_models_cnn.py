"""Shape/structure tests for the CNN/ResNet model families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.autoencoder import (
    ResNetAutoEncoder,
    TransformerAutoEncoder,
    VanillaAutoEncoder,
)
from vit_ad_tpu.models.cnn import VanillaCNNEncoder
from vit_ad_tpu.models.decoders import ResNetDecoder, SmallDecoder
from vit_ad_tpu.models.resnet import ResNetEncoder
from vit_ad_tpu.models.reverse_resnet import ReverseResNet
from vit_ad_tpu.models.vit import ViTEncoder

F32 = DtypePolicy.f32()


def test_vanilla_cnn_encoder_shape():
    enc = VanillaCNNEncoder(img_size=64, dtypes=F32)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = enc.init(jax.random.key(0), x)
    out = enc.apply(vars_, x)
    assert out.patch_embedding.shape == (2, 4, 768)  # (64 / 2^5)^2 tokens
    assert out.latent.shape == (2, 768)


def test_small_decoder_shapes():
    dec = SmallDecoder(img_size=64, z_space=0, dtypes=F32)
    x = jnp.zeros((2, 2, 2, 768))
    vars_ = dec.init(jax.random.key(0), x, train=True)
    y = dec.apply(vars_, x, train=False)
    assert y.shape == (2, 64, 64, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0

    dec_z = SmallDecoder(img_size=64, z_space=100, dtypes=F32)
    z = jnp.zeros((2, 100))
    vars_z = dec_z.init(jax.random.key(0), z, train=True)
    assert dec_z.apply(vars_z, z, train=False).shape == (2, 64, 64, 3)


def test_resnet_encoder_stages():
    enc = ResNetEncoder(img_size=64, dtypes=F32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = enc.init(jax.random.key(0), x)
    out = enc.apply(vars_, x)
    assert out.latent.shape == (1, 2048)
    assert out.patch_embedding.shape == (1, 4, 2048)  # (64/32)^2 patches
    stages = enc.apply(vars_, x, method=ResNetEncoder.stage_features)
    assert [s.shape for s in stages] == [
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 1024),
        (1, 2, 2, 2048),
    ]


def test_reverse_resnet_shape():
    dec = ReverseResNet(img_size=64, dtypes=F32)
    z = jnp.zeros((1, 2048))
    vars_ = dec.init(jax.random.key(0), z, train=True)
    y = dec.apply(vars_, z, train=False)
    assert y.shape == (1, 64, 64, 3)


def test_resnet_decoder_shape():
    dec = ResNetDecoder(embedding_size=48, img_size=64, dtypes=F32)
    z = jnp.zeros((2, 48))
    vars_ = dec.init(jax.random.key(0), z, train=True)
    assert dec.apply(vars_, z, train=False).shape == (2, 64, 64, 3)


@pytest.mark.parametrize("small", [True, False])
def test_resnet_autoencoder(small):
    ae = ResNetAutoEncoder(img_size=64, small_decoder=small, dtypes=F32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = ae.init(jax.random.key(0), x, train=True)
    out = ae.apply(vars_, x, train=False)
    assert out.reconstruction.shape == (1, 64, 64, 3)
    assert out.latent.shape == (1, 2048)


def test_vanilla_autoencoder():
    ae = VanillaAutoEncoder(img_size=64, dtypes=F32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = ae.init(jax.random.key(0), x, train=True)
    out = ae.apply(vars_, x, train=False)
    assert out.reconstruction.shape == (1, 64, 64, 3)


@pytest.mark.parametrize("kind", ["resnet", "cnn"])
def test_transformer_autoencoder(kind):
    enc = ViTEncoder(
        img_size=64, patch_size=16, embed_dim=48, depth=1, num_heads=4,
        num_prefix_tokens=2, dtypes=F32,
    )
    ae = TransformerAutoEncoder(
        encoder=enc, decoder_kind=kind, img_size=64, dtypes=F32
    )
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = ae.init(jax.random.key(0), x, train=True)
    out = ae.apply(vars_, x, train=False)
    assert out.reconstruction.shape == (1, 64, 64, 3)
    assert out.patch_embedding.shape == (1, 16, 48)
    assert out.latent.shape == (1, 48)
