"""Decoder weight converters: torch-layout goldens.

Torch models are built here in the REFERENCE's layouts (attribute names,
Sequential indices, ConvTranspose specs — reference src/classes/
CnnDecoder.py:16-196, src/classes/resnet/ReverseResNet.py:46-215) with
random weights; converted forwards must match the torch eval-mode forwards.
"""

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.decoders import ResNetDecoder, SmallDecoder
from vit_ad_tpu.utils.torch_convert import (
    convert_resnet_decoder,
    convert_small_decoder,
    state_dict_to_numpy,
)


def _randomize(module: tnn.Module, seed: int = 0) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


class TorchSmallDecoder(tnn.Module):
    """Reference DecoderVanillaCNN layout (CnnDecoder.py:16-117)."""

    def __init__(self, z_space: int, s: int):
        super().__init__()
        self.decoder_lin = tnn.Sequential(
            tnn.Linear(z_space, 2 * z_space), tnn.ReLU(),
            tnn.Linear(2 * z_space, 768 * s * s), tnn.ReLU(),
        )
        self.s = s
        chans = (768, 384, 192, 96, 48, 3)
        convs = [
            tnn.ConvTranspose2d(chans[i], chans[i + 1], 3, stride=2,
                                padding=1, output_padding=1)
            for i in range(5)
        ]
        (self.recon_conv1, self.recon_conv2, self.recon_conv3,
         self.recon_conv4, self.recon_conv5) = convs
        seq = []
        for i, c in enumerate(convs):
            seq += [c, tnn.BatchNorm2d(chans[i + 1])]
            seq += [tnn.ReLU()] if i < 4 else [tnn.Tanh()]
        self.decoder_cnn = tnn.Sequential(*seq)

    def forward(self, z):
        x = self.decoder_lin[1](self.decoder_lin[0](z))
        x = self.decoder_lin[3](self.decoder_lin[2](x))
        x = x.reshape(x.shape[0], 768, self.s, self.s)
        return self.decoder_cnn(x)


def test_small_decoder_golden(rng):
    z_space, s = 32, 2  # 64px output
    t = TorchSmallDecoder(z_space, s).eval()
    _randomize(t)
    z = rng.normal(size=(2, z_space)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(z)).numpy()  # [B, 3, 64, 64]

    dec = SmallDecoder(img_size=32 * s, z_space=z_space,
                       dtypes=DtypePolicy.f32())
    target = dec.init(jax.random.key(0), jnp.zeros((1, z_space)))
    conv = convert_small_decoder(state_dict_to_numpy(t.state_dict()))
    assert jax.tree.map(jnp.shape, conv) == jax.tree.map(jnp.shape, target)
    got = np.asarray(dec.apply(conv, jnp.asarray(z))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TorchRevBottleneck(tnn.Module):
    """Reference ReverseResNet Bottleneck (ReverseResNet.py:46-104)."""

    def __init__(self, out_ch, planes, stride=1, op=0, upsample=None):
        super().__init__()
        self.conv3 = tnn.ConvTranspose2d(planes * 4, planes, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.ConvTranspose2d(planes, planes, 3, stride=stride,
                                         padding=1, output_padding=op,
                                         bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv1 = tnn.ConvTranspose2d(planes, out_ch, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_ch)
        self.upsample = upsample
        self.relu = tnn.ReLU()

    def forward(self, x):
        out = self.relu(self.bn3(self.conv3(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn1(self.conv1(out))
        identity = self.upsample(x) if self.upsample is not None else x
        return self.relu(out + identity)


def _make_layer(planes, blocks, stride, op, last_dim):
    """Reference _make_layer ordering: blocks-1 identity blocks, then the
    channel-changing block with the upsample branch (ReverseResNet.py:166-215)."""
    layers = [
        TorchRevBottleneck(planes * 4, planes) for _ in range(blocks - 1)
    ]
    upsample = tnn.Sequential(
        tnn.ConvTranspose2d(planes * 4, last_dim, 1, stride=stride,
                            output_padding=op, bias=False),
        tnn.BatchNorm2d(last_dim),
    )
    layers.append(
        TorchRevBottleneck(last_dim, planes, stride, op, upsample)
    )
    return tnn.Sequential(*layers)


class TorchResNetDecoder(tnn.Module):
    """Reference DecoderResNetVariableEmbeddingSize layout
    (CnnDecoder.py:158-196 over ReverseResNet.py:106-242, cnns-only path)."""

    def __init__(self, embedding_size: int, img: int):
        super().__init__()
        h = 2 * embedding_size
        self.fc1 = tnn.Sequential(tnn.Linear(embedding_size, h), tnn.ReLU())
        self.fc2 = tnn.Sequential(tnn.Linear(h, 2048), tnn.ReLU())
        self.img = img
        self.layer4 = _make_layer(512, 3, 2, 1, 1024)
        self.layer3 = _make_layer(256, 4, 2, 1, 512)
        self.layer2 = _make_layer(128, 6, 2, 1, 256)
        self.layer1 = _make_layer(64, 3, 1, 0, 64)
        self.de_conv1 = tnn.ConvTranspose2d(64, 3, 7, stride=2, padding=3,
                                            output_padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(3)

    def forward(self, z):
        x = self.fc2(self.fc1(z))
        x = x.reshape(x.shape[0], 2048, 1, 1)
        x = tnn.functional.interpolate(x, size=self.img // 32, mode="nearest")
        x = self.layer1(self.layer2(self.layer3(self.layer4(x))))
        x = tnn.functional.interpolate(x, size=self.img // 2, mode="nearest")
        return torch.tanh(self.bn1(self.de_conv1(x)))


@pytest.mark.slow
def test_resnet_decoder_golden(rng):
    emb, img = 16, 64
    t = TorchResNetDecoder(emb, img).eval()
    _randomize(t)
    z = rng.normal(size=(1, emb)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(z)).numpy()  # [1, 3, 64, 64]

    dec = ResNetDecoder(embedding_size=emb, img_size=img,
                        dtypes=DtypePolicy.f32())
    target = dec.init(jax.random.key(0), jnp.zeros((1, emb)))
    conv = convert_resnet_decoder(state_dict_to_numpy(t.state_dict()))
    assert jax.tree.map(jnp.shape, conv) == jax.tree.map(jnp.shape, target)
    got = np.asarray(dec.apply(conv, jnp.asarray(z))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_validate_pth_recon_roundtrip(tmp_path, rng):
    """A torch-saved full AutoEncoder state dict (timm-structured encoder +
    reference small decoder) re-evaluates through validate_pth."""
    import validation_loop as vl
    from test_torch_convert import TorchViT
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.models.autoencoder import TransformerAutoEncoder
    from vit_ad_tpu.models.vit import ViTEncoder

    root = tmp_path / "data"
    make_mvtec_category(str(root), "widget", img_size=32, n_train=8)

    class TorchAE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = tnn.Module()
            # the reference registers the timm model at a family-named
            # attribute (TransformerEncoder.py:134: self.deit = ...)
            self.encoder.deit = TorchViT(img=32, patch=8, dim=32, depth=2,
                                         heads=4, prefix=2)
            self.decoder = TorchSmallDecoder(z_space=32, s=1)

    torch.manual_seed(7)
    t = TorchAE().eval()
    _randomize(t, seed=7)
    pth = tmp_path / "50-epochs_2026_mvtec_widget.pth"
    torch.save(t.state_dict(), pth)

    def tiny_get_model(name, img_size, dtypes):
        enc = ViTEncoder(img_size=img_size, patch_size=8, embed_dim=32,
                         depth=2, num_heads=4, num_prefix_tokens=2,
                         dtypes=DtypePolicy.f32())
        return TransformerAutoEncoder(encoder=enc, decoder_kind="cnn",
                                      img_size=img_size,
                                      dtypes=DtypePolicy.f32())

    import vit_ad_tpu.registry

    orig = vit_ad_tpu.registry.get_model
    vit_ad_tpu.registry.get_model = tiny_get_model
    try:
        metrics = vl.validate_pth(str(pth), "ae_deit", "recon", str(root),
                                  img_size=32)
    finally:
        vit_ad_tpu.registry.get_model = orig
    assert "image_auroc_score" in metrics
    assert 0.0 <= metrics["image_auroc_score"] <= 1.0


@pytest.mark.slow
def test_resnet_ae_convert_golden(rng):
    """Full reference AutoEncoderResNet state dict (torchvision-layout
    ResNet-50 encoder + stage norms + ReverseResNet decoder) converts and
    reproduces the torch cnns-only reconstruction."""
    from test_torch_convert import TorchResNet50
    from vit_ad_tpu.models.autoencoder import ResNetAutoEncoder
    from vit_ad_tpu.utils.torch_convert import convert_recon_ae

    img = 64

    class TorchResNetEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.res_net = TorchResNet50()
            chans, scales = (256, 512, 1024, 2048), (4, 8, 16, 32)
            self.norms = tnn.ModuleList(
                tnn.LayerNorm([c, img // s, img // s]) for c, s in zip(chans, scales)
            )

    class TorchResNetAE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = TorchResNetEncoder()
            self.decoder = TorchReverseResNet()

    class TorchReverseResNet(tnn.Module):
        """Reference ReverseResNet root layout (cnns-only forward)."""

        def __init__(self):
            super().__init__()
            self.layer4 = _make_layer(512, 3, 2, 1, 1024)
            self.layer3 = _make_layer(256, 4, 2, 1, 512)
            self.layer2 = _make_layer(128, 6, 2, 1, 256)
            self.layer1 = _make_layer(64, 3, 1, 0, 64)
            self.de_conv1 = tnn.ConvTranspose2d(64, 3, 7, stride=2, padding=3,
                                                output_padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(3)

        def forward(self, z):  # z: [B, 2048]
            x = z[:, :, None, None]
            x = tnn.functional.interpolate(x, size=img // 32, mode="nearest")
            x = self.layer1(self.layer2(self.layer3(self.layer4(x))))
            x = tnn.functional.interpolate(x, size=img // 2, mode="nearest")
            return torch.tanh(self.bn1(self.de_conv1(x)))

    torch.manual_seed(11)
    t = TorchResNetAE().eval()
    _randomize(t, seed=11)
    x = rng.normal(size=(1, 3, img, img)).astype(np.float32) * 0.5
    with torch.no_grad():
        feats = t.encoder.res_net(torch.from_numpy(x))
        z = feats[-1].mean(dim=(2, 3))  # pooled stage-4 latent
        want = t.decoder(z).numpy()

    ae = ResNetAutoEncoder(img_size=img, dtypes=DtypePolicy.f32())
    target = ae.init(jax.random.key(0), jnp.zeros((1, img, img, 3)),
                     train=True)
    conv = convert_recon_ae(state_dict_to_numpy(t.state_dict()))
    assert jax.tree.map(jnp.shape, conv["params"]) == jax.tree.map(
        jnp.shape, target["params"]
    )
    out = ae.apply(conv, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(out.reconstruction).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.latent), z.numpy(),
                               rtol=1e-4, atol=1e-4)
