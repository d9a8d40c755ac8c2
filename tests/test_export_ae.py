"""JAX → reference-format .pth export for the transformer reconstruction
AEs (torch_convert.export_vit / export_small_decoder / export_resnet_decoder
/ export_transformer_ae): exported state dicts strict-load into torch models
built in the REFERENCE's layouts (the test_decoder_convert /
test_torch_convert replicas), match the forward numerically, and round-trip
through our own converters bit-exactly."""

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from test_decoder_convert import (
    TorchResNetDecoder,
    TorchSmallDecoder,
    _randomize,
)
from test_torch_convert import TorchViT
from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.autoencoder import TransformerAutoEncoder
from vit_ad_tpu.models.decoders import ResNetDecoder, SmallDecoder
from vit_ad_tpu.models.vit import ViTEncoder
from vit_ad_tpu.utils.torch_convert import (
    convert_resnet_decoder,
    convert_small_decoder,
    convert_transformer_ae,
    convert_vit,
    export_resnet_decoder,
    export_small_decoder,
    export_transformer_ae,
    export_vit,
    state_dict_to_numpy,
)

F32 = DtypePolicy.f32()


def _as_torch(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def _assert_tree_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )


def test_export_vit_strict_loads_and_matches():
    enc = ViTEncoder(img_size=32, patch_size=8, embed_dim=32, depth=2,
                     num_heads=4, num_prefix_tokens=2, dtypes=F32)
    variables = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd = export_vit(variables["params"])

    tm = TorchViT(img=32, patch=8, dim=32, depth=2, heads=4, prefix=2)
    tm.load_state_dict(_as_torch(sd), strict=True)
    tm.eval()

    x = np.random.default_rng(1).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # [B, prefix+P, D] all tokens
    got = np.asarray(
        enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))).patch_embedding
    )
    np.testing.assert_allclose(got, want[:, 2:], rtol=2e-4, atol=2e-5)


def test_export_vit_roundtrip_bit_exact():
    enc = ViTEncoder(img_size=32, patch_size=8, embed_dim=32, depth=2,
                     num_heads=4, num_prefix_tokens=2, dtypes=F32)
    variables = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    back = convert_vit(export_vit(variables["params"]), depth=2,
                       num_prefix_tokens=2)
    _assert_tree_equal(back["params"], variables["params"])


def test_export_small_decoder_strict_loads_and_matches():
    z_space, s = 32, 2
    dec = SmallDecoder(img_size=32 * s, z_space=z_space, dtypes=F32)
    variables = dec.init(jax.random.key(1), jnp.zeros((1, z_space)))
    sd = export_small_decoder(variables)

    tm = TorchSmallDecoder(z_space, s)
    tm.load_state_dict(_as_torch(sd), strict=True)
    tm.eval()

    z = np.random.default_rng(2).normal(size=(2, z_space)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(z)).numpy()
    got = np.asarray(dec.apply(variables, jnp.asarray(z))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_export_small_decoder_roundtrip_bit_exact():
    dec = SmallDecoder(img_size=64, z_space=32, dtypes=F32)
    variables = dec.init(jax.random.key(1), jnp.zeros((1, 32)))
    back = convert_small_decoder(export_small_decoder(variables))
    _assert_tree_equal(back, variables)


@pytest.mark.slow
def test_export_resnet_decoder_strict_loads_and_matches():
    emb, img = 16, 64
    dec = ResNetDecoder(embedding_size=emb, img_size=img, dtypes=F32)
    variables = dec.init(jax.random.key(2), jnp.zeros((1, emb)))
    sd = export_resnet_decoder(variables)

    tm = TorchResNetDecoder(emb, img)
    tm.load_state_dict(_as_torch(sd), strict=True)
    tm.eval()

    z = np.random.default_rng(3).normal(size=(1, emb)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(z)).numpy()
    got = np.asarray(dec.apply(variables, jnp.asarray(z))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_export_resnet_decoder_roundtrip_bit_exact():
    dec = ResNetDecoder(embedding_size=16, img_size=64, dtypes=F32)
    variables = dec.init(jax.random.key(2), jnp.zeros((1, 16)))
    back = convert_resnet_decoder(export_resnet_decoder(variables))
    _assert_tree_equal(back, variables)


def test_transformer_ae_encoder_attr_routing(monkeypatch):
    """convert_transformer_ae must route each reference encoder attribute
    (encoder.deit/vit/nest/efficientformer/esvit — the family-named timm
    members, reference TransformerEncoder.py:57,92,134,193,267) to its
    family converter with the prefix stripped, and surface encoder
    batch_stats (EfficientFormer carries BN state)."""
    import vit_ad_tpu.utils.torch_convert as tc

    seen = {}

    def fake(name, stats=None):
        def conv(sd, **kw):
            seen[name] = dict(sd)
            out = {"params": {"tag": name}}
            if stats:
                out["batch_stats"] = stats
            return out
        return conv

    monkeypatch.setattr(tc, "convert_nest", fake("nest"))
    monkeypatch.setattr(
        tc, "convert_efficientformer", fake("efficientformer", {"bn": 1})
    )
    monkeypatch.setattr(tc, "convert_swin", fake("esvit"))
    monkeypatch.setattr(
        tc, "convert_small_decoder",
        lambda sd: {"params": {"d": 1}, "batch_stats": {"db": 1}},
    )

    for attr in ("nest", "efficientformer", "esvit"):
        sd = {f"encoder.{attr}.w": np.zeros(1), "decoder.recon_conv1.weight":
              np.zeros(1)}
        out = tc.convert_transformer_ae(sd, img_size=64)
        assert out["params"]["encoder"] == {"tag": attr}
        assert seen[attr] == {"w": sd[f"encoder.{attr}.w"]}
        if attr == "efficientformer":
            assert out["batch_stats"]["encoder"] == {"bn": 1}
        else:
            assert "encoder" not in out["batch_stats"]
        assert out["batch_stats"]["decoder"] == {"db": 1}

    with pytest.raises(ValueError, match="no known encoder attribute"):
        tc.convert_transformer_ae({"encoder.mystery.w": np.zeros(1)})
    with pytest.raises(ValueError, match="unexpected AE keys"):
        tc.convert_transformer_ae(
            {"encoder.nest.w": np.zeros(1), "stray.key": np.zeros(1)}
        )


class TorchVanillaEncoder(tnn.Module):
    """Reference EncoderVanillaCNN layout (CnnEncoder.py:16-103): conv
    attributes + the `encoder` Sequential re-registering the same convs."""

    def __init__(self):
        super().__init__()
        chans = (3, 48, 96, 192, 384, 768)
        convs = [
            tnn.Conv2d(chans[i], chans[i + 1], 3, stride=1, padding=1)
            for i in range(5)
        ]
        (self.conv1, self.conv2, self.conv3, self.conv4, self.conv5) = convs
        seq = []
        for i, c in enumerate(convs):
            seq += [c, tnn.BatchNorm2d(chans[i + 1]), tnn.ReLU(),
                    tnn.MaxPool2d(3, stride=2, padding=1)]
        self.encoder = tnn.Sequential(*seq)

    def forward(self, x):
        return self.encoder(x)


class TorchVanillaDecoder(tnn.Module):
    """Reference DecoderVanillaCNN with z_space=0 (no decoder_lin)."""

    def __init__(self):
        super().__init__()
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

    def forward(self, x):
        return self.decoder_cnn(x)


class TorchVanillaAE(tnn.Module):
    """Reference VanillaAutoEncoder .pth layout (CnnAutoEncoder.py:27-60;
    the torchmetrics ssim/mse members persist no state)."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchVanillaEncoder()
        self.decoder = TorchVanillaDecoder()

    def forward(self, x):
        return self.decoder(self.encoder(x))


def test_vanilla_ae_import_golden():
    """Reference-layout VanillaAutoEncoder .pth → convert_recon_ae →
    forward parity with the torch eval-mode reconstruction (the first torch
    golden for the vanilla CNN encoder's conv/pool semantics)."""
    from vit_ad_tpu.models.autoencoder import VanillaAutoEncoder
    from vit_ad_tpu.utils.torch_convert import convert_recon_ae

    torch.manual_seed(11)
    tm = TorchVanillaAE().eval()
    _randomize(tm, seed=11)
    x = np.random.default_rng(6).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    model = VanillaAutoEncoder(img_size=32, dtypes=F32)
    conv = convert_recon_ae(state_dict_to_numpy(tm.state_dict()))
    got = np.asarray(
        model.apply(conv, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    train=False).reconstruction
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_export_vanilla_ae_full_pth_roundtrip(tmp_path):
    from vit_ad_tpu.models.autoencoder import VanillaAutoEncoder
    from vit_ad_tpu.utils.torch_convert import (
        convert_recon_ae,
        export_vanilla_ae,
    )

    model = VanillaAutoEncoder(img_size=32, dtypes=F32)
    variables = model.init(jax.random.key(6), jnp.zeros((1, 32, 32, 3)),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    sd = export_vanilla_ae(variables)

    tm = TorchVanillaAE()
    tm.load_state_dict(_as_torch(sd), strict=True)

    path = tmp_path / "vanilla_ae.pth"
    torch.save(_as_torch(sd), path)
    loaded = torch.load(path, weights_only=True)
    back = convert_recon_ae(state_dict_to_numpy(loaded))
    _assert_tree_equal(back["params"], variables["params"])
    _assert_tree_equal(back["batch_stats"], variables["batch_stats"])


@pytest.mark.slow
def test_export_resnet_ae_full_pth_roundtrip(tmp_path):
    """ResNetAutoEncoder export: strict-loads into the reference
    AutoEncoderResNet layout (frozen torchvision trunk WITH its unused fc —
    emitted zeroed — stage norms, ReverseResNet decoder) and round-trips
    through convert_recon_ae bit-exactly (fc keys dropped on import)."""
    from test_torch_convert import TorchResNet50
    from vit_ad_tpu.models.autoencoder import ResNetAutoEncoder
    from vit_ad_tpu.utils.torch_convert import (
        convert_recon_ae,
        export_resnet_ae,
    )

    img = 64
    model = ResNetAutoEncoder(img_size=img, dtypes=F32)
    variables = model.init(jax.random.key(5), jnp.zeros((1, img, img, 3)),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    sd = export_resnet_ae(variables)

    class TorchResNet50FC(TorchResNet50):
        def __init__(self):
            super().__init__()
            self.fc = tnn.Linear(2048, 1000)

    class TorchResNetEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.res_net = TorchResNet50FC()
            chans, scales = (256, 512, 1024, 2048), (4, 8, 16, 32)
            self.norms = tnn.ModuleList(
                tnn.LayerNorm([c, img // s, img // s])
                for c, s in zip(chans, scales)
            )

    from test_decoder_convert import _make_layer

    class TorchReverseResNet(tnn.Module):
        """Reference ReverseResNet root layout (ReverseResNet.py:106-242)."""

        def __init__(self):
            super().__init__()
            self.layer4 = _make_layer(512, 3, 2, 1, 1024)
            self.layer3 = _make_layer(256, 4, 2, 1, 512)
            self.layer2 = _make_layer(128, 6, 2, 1, 256)
            self.layer1 = _make_layer(64, 3, 1, 0, 64)
            self.de_conv1 = tnn.ConvTranspose2d(64, 3, 7, stride=2, padding=3,
                                                output_padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(3)

    class TorchResNetAE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = TorchResNetEncoder()
            self.decoder = TorchReverseResNet()

    tm = TorchResNetAE()
    tm.load_state_dict(_as_torch(sd), strict=True)

    path = tmp_path / "resnet_ae.pth"
    torch.save(_as_torch(sd), path)
    loaded = torch.load(path, weights_only=True)
    back = convert_recon_ae(state_dict_to_numpy(loaded))
    _assert_tree_equal(back["params"], variables["params"])
    _assert_tree_equal(back["batch_stats"], variables["batch_stats"])


def test_export_transformer_ae_full_pth_roundtrip(tmp_path):
    """Full AE export: our trained-format variables → reference .pth →
    torch replica strict-load → reconstruction parity; and the .pth
    round-trips through convert_transformer_ae bit-exactly."""
    enc = ViTEncoder(img_size=32, patch_size=8, embed_dim=32, depth=2,
                     num_heads=4, num_prefix_tokens=2, dtypes=F32)
    model = TransformerAutoEncoder(encoder=enc, decoder_kind="cnn",
                                   img_size=32, dtypes=F32)
    variables = model.init(jax.random.key(4), jnp.zeros((1, 32, 32, 3)),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    sd = export_transformer_ae(variables)

    class TorchDeitWithHeads(TorchViT):
        """timm deit_base_distilled keeps its (frozen, unused) classifier
        heads in the state dict — the export emits them zeroed."""

        def __init__(self, **kw):
            super().__init__(**kw)
            self.head = tnn.Linear(kw["dim"], 1000)
            self.head_dist = tnn.Linear(kw["dim"], 1000)

    class TorchAE(tnn.Module):
        """Reference AutoEncoderDeit layout: the timm model lives at
        `encoder.deit` (reference TransformerEncoder.py:134)."""

        def __init__(self):
            super().__init__()
            self.encoder = tnn.Module()
            self.encoder.deit = TorchDeitWithHeads(img=32, patch=8, dim=32,
                                                   depth=2, heads=4, prefix=2)
            # our decoder_kind="cnn" builds SmallDecoder(z_space=embed_dim)
            # over the [B, D] latent; s = ceil(32 / 2^5) = 1
            self.decoder = TorchSmallDecoder(z_space=32, s=1)

    tm = TorchAE()
    tm.load_state_dict(_as_torch(sd), strict=True)
    tm.eval()

    path = tmp_path / "ae.pth"
    torch.save(_as_torch(sd), path)
    loaded = torch.load(path, weights_only=True)
    back = convert_transformer_ae(state_dict_to_numpy(loaded))
    _assert_tree_equal(back["params"], variables["params"])
    _assert_tree_equal(back["batch_stats"]["decoder"],
                       variables["batch_stats"].get("decoder", {}))
