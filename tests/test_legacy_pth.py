"""Reference-format .pth head re-evaluation (VERDICT round-1 item 9):
torch GaussianMixtureDensityNetwork and FrEIA-style AllInOneBlock chains
convert onto our heads with bit-parity, and validation_loop accepts a
directory of legacy .pth files."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.utils.torch_convert import (
    convert_mdn_head,
    convert_nf_head,
    merge_variables,
    state_dict_to_numpy,
)

F32 = DtypePolicy.f32()


class TorchGMDN(tnn.Module):
    """Reference MixtureDensityNetwork layout (pi, sigma, mu Linears,
    src/classes/MixtureDensityNetwork.py:117-171)."""

    def __init__(self, d, k):
        super().__init__()
        self.pi = tnn.Linear(d, k)
        self.sigma = tnn.Linear(d, d * k)
        self.mu = tnn.Linear(d, d * k)
        self.d, self.k = d, k

    def forward(self, x):  # [B, P, D]
        pi = self.pi(x)
        sigma = (torch.nn.functional.elu(self.sigma(x)) + 1 + 1e-15).view(
            x.size(0), x.size(1), self.d, self.k
        )
        mu = self.mu(x).view(x.size(0), x.size(1), self.d, self.k)
        return pi, sigma, mu


def test_mdn_head_convert_golden(rng):
    from vit_ad_tpu.models.mdn import GaussianMDN

    torch.manual_seed(5)
    d, k = 6, 3
    tm = TorchGMDN(d, k).eval()
    mdn = GaussianMDN(features=d, num_gaussians=k, dtypes=F32)
    target = mdn.init(jax.random.key(0), jnp.zeros((1, 1, d)))
    head = merge_variables(target, convert_mdn_head(
        state_dict_to_numpy(tm.state_dict())
    ))

    x = rng.normal(size=(2, 5, d)).astype(np.float32)
    with torch.no_grad():
        pi_t, sigma_t, mu_t = tm(torch.from_numpy(x))
    out = mdn.apply(head, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.pi), pi_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.sigma), sigma_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.mu), mu_t.numpy(), rtol=1e-5, atol=1e-6)


class TorchAllInOneBlock(tnn.Module):
    """Independent torch implementation of FrEIA AllInOneBlock semantics
    (coupling → learned global affine → fixed permutation), with the FrEIA
    state-dict key names (subnet.{0,2}, global_scale/offset [1,C,1,1],
    w_perm/w_perm_inv [C,C,1,1])."""

    def __init__(self, c, k, hidden, seed, clamp=2.0):
        super().__init__()
        self.split1 = c - c // 2
        self.split2 = c // 2
        self.clamp = clamp
        self.subnet = tnn.Sequential(
            tnn.Conv2d(self.split1, hidden, k, padding=k // 2),
            tnn.ReLU(),
            tnn.Conv2d(hidden, 2 * self.split2, k, padding=k // 2),
        )
        init = 2.0 * math.log(math.exp(5.0) - 1.0)
        self.global_scale = tnn.Parameter(torch.full((1, c, 1, 1), init))
        self.global_offset = tnn.Parameter(torch.zeros(1, c, 1, 1))
        perm = np.random.default_rng(seed).permutation(c)
        w = np.zeros((c, c), np.float32)
        w[np.arange(c), perm] = 1.0  # out[i] = y[perm[i]]
        self.register_buffer("w_perm", torch.from_numpy(w).view(c, c, 1, 1))
        self.register_buffer("w_perm_inv", torch.from_numpy(w.T).view(c, c, 1, 1))

    def forward(self, x):  # NCHW
        h, w = x.shape[2], x.shape[3]
        x1, x2 = x[:, : self.split1], x[:, self.split1:]
        a = self.subnet(x1) * 0.1
        s = self.clamp * 0.636 * torch.atan(a[:, : self.split2])
        t = a[:, self.split2:]
        x2 = x2 * torch.exp(s) + t
        logdet = s.sum(dim=(1, 2, 3))
        y = torch.cat([x1, x2], 1)
        scale = 0.2 * torch.log1p(torch.exp(0.5 * self.global_scale))
        y = y * scale + self.global_offset
        logdet = logdet + h * w * torch.log(scale).sum()
        y = torch.nn.functional.conv2d(y, self.w_perm)
        return y, logdet


class TorchRefNF(tnn.Module):
    """Reference NormalizingFlow state-dict shape:
    fast_flow_decoder.module_list.{i}.* (the SequenceINN attribute name,
    src/classes/NormalizingFlow.py:51) plus the unused layer_norm member
    over the (C, h, w) map (:43-45)."""

    def __init__(self, c, hidden, steps, side=4, perm_seed=100):
        super().__init__()
        self.fast_flow_decoder = tnn.Module()
        self.fast_flow_decoder.module_list = tnn.ModuleList([
            TorchAllInOneBlock(
                c, 3 if i % 2 == 0 else 1, hidden, seed=perm_seed + i
            )
            for i in range(steps)
        ])
        # dead member, dropped by the converter
        self.layer_norm = tnn.LayerNorm((c, side, side))

    def forward(self, x):
        total = torch.zeros(x.shape[0])
        for block in self.fast_flow_decoder.module_list:
            x, ld = block(x)
            total = total + ld
        return x, total


@pytest.mark.parametrize("steps", [4, 3])
def test_nf_head_convert_golden(rng, steps):
    from vit_ad_tpu.models.flow import NormalizingFlow

    torch.manual_seed(9)
    c, hidden = 6, 4
    tm = TorchRefNF(c, hidden, steps).eval()
    converted, perms = convert_nf_head(
        state_dict_to_numpy(tm.state_dict()), flow_steps=steps
    )
    flow = NormalizingFlow(
        num_channels=c, img_size=16, num_patches=16, hidden_ratio=hidden / (c - c // 2),
        flow_steps=steps, perms=perms, dtypes=F32,
    )
    target = flow.init(jax.random.key(0), jnp.zeros((1, 4, 4, c)))
    head = merge_variables(target, converted)

    x = rng.normal(size=(2, 4, 4, c)).astype(np.float32)
    with torch.no_grad():
        z_t, ld_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    z, ld = flow.apply(head, jnp.asarray(x), method=NormalizingFlow.transform)
    np.testing.assert_allclose(
        np.asarray(z), z_t.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(ld), ld_t.numpy(), rtol=2e-4, atol=2e-5)


def test_validation_loop_accepts_reference_pth(tmp_path, rng):
    """End-to-end: a torch-saved MDN head state dict re-evaluates through
    validation_loop.validate_pth against a synthetic category."""
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    import validation_loop as vl

    root = tmp_path / "data"
    make_mvtec_category(str(root), "widget", img_size=32, n_train=8)

    torch.manual_seed(5)
    d = 32  # matches the tiny deit override below
    tm = TorchGMDN(d, 4)
    pth_dir = tmp_path / "weights"
    pth_dir.mkdir()
    torch.save(tm.state_dict(), pth_dir / "4_gaussians_600-epochs_widget.pth")

    ng, dc = vl.parse_pth_filename("4_gaussians_600-epochs_widget.pth", "mdn")
    assert ng == 4 and dc == "widget"
    ng, dc = vl.parse_pth_filename("100_g_metal_nut.pth", "mdn")
    assert dc == "metal_nut"

    # tiny encoder stand-in for enc_deit (full DeiT-base is too slow on the
    # test CPU); patch the registry lookup
    from vit_ad_tpu.models.vit import ViTEncoder

    def tiny_get_model(name, img_size, dtypes):
        return ViTEncoder(img_size=img_size, patch_size=8, embed_dim=d,
                          depth=2, num_heads=4, num_prefix_tokens=2,
                          dtypes=DtypePolicy.f32())

    import vit_ad_tpu.registry

    orig = vit_ad_tpu.registry.get_model
    vit_ad_tpu.registry.get_model = tiny_get_model
    try:
        metrics = vl.validate_pth(
            str(pth_dir / "4_gaussians_600-epochs_widget.pth"),
            "enc_deit", "mdn", str(root), img_size=32,
        )
    finally:
        vit_ad_tpu.registry.get_model = orig
    assert "image_auroc_score" in metrics
    assert 0.0 <= metrics["image_auroc_score"] <= 1.0


def test_validate_pth_resnet_mdn_two_files(tmp_path, rng):
    """The reference's two-file ResNet-MDN legacy convention re-evaluates
    (one torch GMM state dict per stage, channels 1024/2048)."""
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    import validation_loop as vl

    root = tmp_path / "data"
    make_mvtec_category(str(root), "widget", img_size=64, n_train=4,
                        n_test_good=2, n_test_defect=2)
    torch.manual_seed(3)
    p2 = tmp_path / "3_gaussians_s2_widget.pth"
    p3 = tmp_path / "3_gaussians_s3_widget.pth"
    torch.save(TorchGMDN(1024, 3).state_dict(), p2)
    torch.save(TorchGMDN(2048, 3).state_dict(), p3)
    metrics = vl.validate_pth_resnet_mdn(str(p2), str(p3), str(root),
                                         img_size=64)
    assert 0.0 <= metrics["image_auroc_score"] <= 1.0

    # with a pretrained trunk supplied (-E, ADVICE round-2 medium): the
    # torchvision-layout resnet50 .pth converts through convert_resnet50 and
    # the evaluation runs against those weights instead of the random init
    import test_torch_convert as ttc

    trunk_pth = tmp_path / "resnet50.pth"
    torch.save(ttc.TorchResNet50().state_dict(), trunk_pth)
    metrics2 = vl.validate_pth_resnet_mdn(
        str(p2), str(p3), str(root), img_size=64,
        encoder_ckpt=str(trunk_pth),
    )
    assert 0.0 <= metrics2["image_auroc_score"] <= 1.0
    # different trunk features ⇒ (almost surely) different scores
    assert metrics2["image_auroc_score"] != metrics["image_auroc_score"] or (
        metrics2["pixel_auroc_score"] != metrics["pixel_auroc_score"]
    )


def test_load_encoder_checkpoint_pth_and_orbax_roundtrip(tmp_path):
    """load_encoder_checkpoint accepts both a torchvision-layout .pth (strict
    converter path) and a convert_weights-style orbax directory, and the two
    resolve to identical trunks."""
    import test_torch_convert as ttc
    import validation_loop as vl
    from vit_ad_tpu.models.resnet import ResNetEncoder
    from vit_ad_tpu.utils.checkpoint import save_params

    torch.manual_seed(11)
    tm = ttc.TorchResNet50()
    pth = tmp_path / "resnet50.pth"
    torch.save(tm.state_dict(), pth)

    enc = ResNetEncoder(img_size=64, dtypes=F32)
    target = enc.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    via_pth = vl.load_encoder_checkpoint(enc, "res_net", str(pth), 64, target)

    # conv1 kernel actually came from torch (OIHW → HWIO)
    want = tm.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    leaves = {
        "/".join(map(str, p)): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(
            via_pth, is_leaf=lambda x: hasattr(x, "shape")
        )
        if hasattr(v, "shape")
    }
    got = [v for v in leaves.values() if v.shape == want.shape]
    assert any(np.allclose(g, want, atol=1e-6) for g in got)

    ckpt_path = save_params(str(tmp_path / "enc"), "encoder", via_pth)
    via_orbax = vl.load_encoder_checkpoint(
        enc, "res_net", ckpt_path, 64, target
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0
        ),
        via_pth, via_orbax,
    )
