"""JAX → reference-format .pth export for the three hierarchical encoder
families (torch_convert.export_nest / export_efficientformer / export_swin)
and their reconstruction AEs: exported state dicts strict-load into torch
models built in the REFERENCE layouts (the import-test replicas, plus a
vendored-module Swin skeleton), recomputed index buffers match the torch
formulas bit-for-bit, and everything round-trips through our own import
converters bit-exactly. Completes the export matrix: every AE family the
reference can load (`validate_recon`, reference validation_loop.py:210) is
now exportable (reference encoder attributes per
TransformerEncoder.py:57,92,267)."""

import numpy as np
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp
from flax import linen as nn

from test_decoder_convert import TorchSmallDecoder
from test_efficientformer_convert import TorchEfficientFormer
from test_nest_convert import TorchNest
from test_swin import TWindowAttention
from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.autoencoder import TransformerAutoEncoder
from vit_ad_tpu.models.efficientformer import EfficientFormer
from vit_ad_tpu.models.nest import NesT
from vit_ad_tpu.models.swin import SwinTransformer
from vit_ad_tpu.utils.torch_convert import (
    convert_efficientformer,
    convert_nest,
    convert_small_decoder,
    convert_swin,
    export_efficientformer,
    export_nest,
    export_small_decoder,
    export_swin,
    export_transformer_ae,
    state_dict_to_numpy,
)

F32 = DtypePolicy.f32()

NEST_KW = dict(embed_dims=(4, 8, 16), num_heads=(1, 2, 4), depths=(1, 1, 2))
EF_KW = dict(dims=(8, 16), depths=(2, 3), vit_num=2, num_heads=2, key_dim=4,
             attn_ratio=2)
SWIN_KW = dict(patch_size=2, embed_dim=8, depths=(2, 2), num_heads=(2, 4),
               window=4)


def _as_torch(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def _assert_tree_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )


class TorchNestWithHead(TorchNest):
    """timm jx_nest keeps its (frozen, unused) classifier head in the state
    dict — the export emits it zeroed."""

    def __init__(self, num_classes=7, **kw):
        super().__init__(**kw)
        self.head = tnn.Linear(16, num_classes)


class TorchEFWithHeads(TorchEfficientFormer):
    """timm efficientformer_l3 is distilled: head + head_dist pair."""

    def __init__(self, num_classes=7, **kw):
        super().__init__(**kw)
        self.head = tnn.Linear(16, num_classes)
        self.head_dist = tnn.Linear(16, num_classes)


class VBlock(tnn.Module):
    """Vendored SwinTransformerBlock state surface (norm1 / attn / norm2 /
    mlp.fc1 / mlp.fc2; reference SwinTransformerModule.py:258-416).
    TWindowAttention registers relative_position_index persistently exactly
    like the vendored module (:134); attn_mask is a lazy cache there
    (:292-314), so no mask buffer exists here either."""

    def __init__(self, dim, heads, ws):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn = TWindowAttention(dim, ws, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)


class VendoredSwin(tnn.Module):
    """Vendored EsViT SwinTransformer state-dict layout
    (SwinTransformerModule.py:689-852) after the reference's surgery
    (head delattr'd, TransformerEncoder.py:256)."""

    def __init__(self, img=16, patch=2, dim=8, depths=(2, 2), heads=(2, 4),
                 ws=4):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        self.patch_embed.norm = tnn.LayerNorm(dim, eps=1e-5)
        res = img // patch
        self.layers = tnn.ModuleList()
        d = dim
        for si, (depth, h) in enumerate(zip(depths, heads)):
            layer = tnn.Module()
            layer.blocks = tnn.ModuleList(
                VBlock(d, h, min(res, ws)) for _ in range(depth)
            )
            if si < len(depths) - 1:
                layer.downsample = tnn.Module()
                layer.downsample.norm = tnn.LayerNorm(4 * d, eps=1e-5)
                layer.downsample.reduction = tnn.Linear(4 * d, 2 * d,
                                                        bias=False)
                res //= 2
                d *= 2
            self.layers.append(layer)
        self.norm = tnn.LayerNorm(d, eps=1e-5)


def test_export_nest_strict_loads_and_roundtrips():
    model = NesT(img_size=32, patch_size=4, dtypes=F32, **NEST_KW)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd = export_nest(variables["params"], num_heads=NEST_KW["num_heads"],
                     num_classes=7)

    tm = TorchNestWithHead()
    tm.load_state_dict(_as_torch(sd), strict=True)

    back = convert_nest(sd, depths=NEST_KW["depths"],
                        num_heads=NEST_KW["num_heads"])
    _assert_tree_equal(back["params"], variables["params"])


def test_export_efficientformer_strict_loads_and_roundtrips():
    model = EfficientFormer(img_size=32, dtypes=F32, **EF_KW)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))
    sd = export_efficientformer(variables, num_classes=7)

    tm = TorchEFWithHeads()
    # the recomputed attention_bias_idxs buffers must equal the torch
    # replica's own (timm |dy|*res + |dx| indexing)
    want = state_dict_to_numpy(tm.state_dict())
    idx_keys = [k for k in want if k.endswith("attention_bias_idxs")]
    assert idx_keys
    for k in idx_keys:
        np.testing.assert_array_equal(sd[k], want[k])
    tm.load_state_dict(_as_torch(sd), strict=True)

    back = convert_efficientformer(sd, depths=EF_KW["depths"],
                                   vit_num=EF_KW["vit_num"])
    _assert_tree_equal(back["params"], variables["params"])
    _assert_tree_equal(back["batch_stats"], variables["batch_stats"])


def test_export_swin_strict_loads_and_roundtrips():
    model = SwinTransformer(img_size=16, dtypes=F32, **SWIN_KW)
    variables = model.init(jax.random.key(2), jnp.zeros((1, 16, 16, 3)))
    sd = export_swin(variables["params"])

    tm = VendoredSwin(img=16)
    want = state_dict_to_numpy(tm.state_dict())
    idx_keys = [k for k in want if k.endswith("relative_position_index")]
    assert idx_keys
    for k in idx_keys:  # numpy formula ≡ vendored torch formula (:120-134)
        np.testing.assert_array_equal(sd[k], want[k])
    assert not any(k.endswith("attn_mask") for k in sd)
    assert not any(k.startswith("head") for k in sd)
    tm.load_state_dict(_as_torch(sd), strict=True)

    back = convert_swin(sd, img_size=16, patch_size=SWIN_KW["patch_size"],
                        depths=SWIN_KW["depths"], window=SWIN_KW["window"])
    _assert_tree_equal(back["params"]["esvit"], variables["params"])


class TinyEsViT(nn.Module):
    """EsViTEncoder-shaped wrapper (submodule named `esvit`) over a tiny
    Swin so the AE export path sees the production param nesting."""

    dtypes: DtypePolicy = DtypePolicy()

    def setup(self):
        self.esvit = SwinTransformer(img_size=32, dtypes=self.dtypes,
                                     **SWIN_KW)

    @property
    def embed_dim(self):
        return 16

    def __call__(self, x, block_index: int = 0):
        return self.esvit(x, block_index=block_index)


def _ae_variables(encoder):
    model = TransformerAutoEncoder(encoder=encoder, decoder_kind="cnn",
                                   img_size=32, dtypes=F32)
    v = model.init(jax.random.key(3), jnp.zeros((1, 32, 32, 3)), train=True)
    return {"params": v["params"], "batch_stats": v.get("batch_stats", {})}


def test_export_transformer_ae_dispatches_all_hierarchical_families(tmp_path):
    """Full-AE export for esvit / nest / efficientformer: family-named
    encoder prefixes (reference TransformerEncoder.py:57,92,267), strict
    torch loads, and bit-exact reimport of both halves."""
    cases = {
        "esvit": TinyEsViT(dtypes=F32),
        "nest": NesT(img_size=32, patch_size=4, dtypes=F32, **NEST_KW),
        "efficientformer": EfficientFormer(img_size=32, dtypes=F32, **EF_KW),
    }
    for attr, enc in cases.items():
        variables = _ae_variables(enc)
        sd = export_transformer_ae(variables,
                                   nest_num_heads=NEST_KW["num_heads"])
        assert all(
            k.startswith((f"encoder.{attr}.", "decoder.")) for k in sd
        ), attr

        class TorchAE(tnn.Module):
            def __init__(self, torch_enc):
                super().__init__()
                self.encoder = tnn.Module()
                setattr(self.encoder, attr, torch_enc)
                self.decoder = TorchSmallDecoder(z_space=16, s=1)

        torch_enc = {
            "esvit": lambda: VendoredSwin(img=32),
            "nest": lambda: TorchNestWithHead(num_classes=1000),
            "efficientformer": lambda: TorchEFWithHeads(num_classes=1000),
        }[attr]()
        tm = TorchAE(torch_enc)
        tm.load_state_dict(_as_torch(sd), strict=True)

        # round-trip both halves through the import converters (the AE-level
        # importer convert_transformer_ae applies real-model-size defaults,
        # so the tiny test strips the prefixes and converts directly)
        enc_sd = {k[len(f"encoder.{attr}."):]: v for k, v in sd.items()
                  if k.startswith(f"encoder.{attr}.")}
        dec_sd = {k[len("decoder."):]: v for k, v in sd.items()
                  if k.startswith("decoder.")}
        if attr == "esvit":
            back = convert_swin(enc_sd, img_size=32,
                                patch_size=SWIN_KW["patch_size"],
                                depths=SWIN_KW["depths"],
                                window=SWIN_KW["window"])["params"]["esvit"]
            want_enc = variables["params"]["encoder"]["esvit"]
        elif attr == "nest":
            back = convert_nest(enc_sd, depths=NEST_KW["depths"],
                                num_heads=NEST_KW["num_heads"])["params"]
            want_enc = variables["params"]["encoder"]
        else:
            out = convert_efficientformer(enc_sd, depths=EF_KW["depths"],
                                          vit_num=EF_KW["vit_num"])
            back = out["params"]
            want_enc = variables["params"]["encoder"]
            _assert_tree_equal(out["batch_stats"],
                               variables["batch_stats"]["encoder"])
        _assert_tree_equal(back, want_enc)

        dec_back = convert_small_decoder(dec_sd)
        _assert_tree_equal(dec_back["params"], variables["params"]["decoder"])
        _assert_tree_equal(dec_back["batch_stats"],
                           variables["batch_stats"]["decoder"])

        # and the decoder exporter alone is the exact inverse
        dec_again = export_small_decoder({
            "params": variables["params"]["decoder"],
            "batch_stats": variables["batch_stats"]["decoder"],
        })
        assert set(dec_again) == set(dec_sd)
