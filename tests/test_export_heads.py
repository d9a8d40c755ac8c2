"""JAX → reference-format .pth export (the interop direction opposite to
test_legacy_pth): TPU-trained MDN/NF heads export into state dicts the
reference loads with strict=True, numerically identical forward behavior,
and round-trip through our own converters bit-exactly."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import test_legacy_pth as tlp
from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.utils.torch_convert import (
    convert_mdn_head,
    convert_nf_head,
    export_mdn_head,
    export_nf_head,
    merge_variables,
    state_dict_to_numpy,
)

F32 = DtypePolicy.f32()


def _mdn_head(d=6, k=3):
    from vit_ad_tpu.models.mdn import GaussianMDN

    mdn = GaussianMDN(features=d, num_gaussians=k, dtypes=F32)
    head = mdn.init(jax.random.key(3), jnp.zeros((1, 1, d)))
    return mdn, head


def test_mdn_export_strict_loads_and_matches_forward():
    d, k = 6, 3
    mdn, head = _mdn_head(d, k)
    sd = export_mdn_head(head)

    tm = tlp.TorchGMDN(d, k)
    tm.load_state_dict({k_: torch.from_numpy(v) for k_, v in sd.items()},
                       strict=True)
    tm.eval()

    x = np.random.default_rng(0).normal(size=(2, 5, d)).astype(np.float32)
    with torch.no_grad():
        pi_t, sigma_t, mu_t = tm(torch.from_numpy(x))
    out = mdn.apply(head, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.pi), pi_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.sigma), sigma_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.mu), mu_t.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_mdn_export_roundtrip_bit_exact():
    _, head = _mdn_head()
    back = convert_mdn_head(export_mdn_head(head))["params"]
    for leaf, v in head["params"].items():
        np.testing.assert_array_equal(np.asarray(v, np.float32), back[leaf])


def _nf_flow(c, hidden, steps, side=4):
    from vit_ad_tpu.models.flow import NormalizingFlow

    flow = NormalizingFlow(
        num_channels=c, img_size=16, num_patches=side * side,
        hidden_ratio=hidden / (c - c // 2), flow_steps=steps, dtypes=F32,
    )
    head = flow.init(jax.random.key(7), jnp.zeros((1, side, side, c)))
    return flow, head


@pytest.mark.parametrize("steps", [4, 3])
def test_nf_export_strict_loads_and_matches_forward(steps):
    """Export with the model's DEFAULT perms, strict-load into the torch
    reference replica (whose own perm buffers get overwritten by the
    checkpoint ones), and compare full-forward z/logdet."""
    from vit_ad_tpu.models.flow import NormalizingFlow

    c, hidden, side = 6, 4, 4
    flow, head = _nf_flow(c, hidden, steps, side)
    sd = export_nf_head(head, num_patches=side * side)

    tm = tlp.TorchRefNF(c, hidden, steps, side=side)
    tm.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                       strict=True)
    tm.eval()

    x = np.random.default_rng(1).normal(size=(2, side, side, c)).astype(
        np.float32
    )
    with torch.no_grad():
        z_t, ld_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    z, ld = flow.apply(head, jnp.asarray(x), method=NormalizingFlow.transform)
    np.testing.assert_allclose(
        np.asarray(z), z_t.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(ld), ld_t.numpy(),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("steps", [4, 3])
def test_nf_export_roundtrip_bit_exact(steps):
    from vit_ad_tpu.models.flow import default_perms

    c, hidden, side = 6, 4, 4
    _, head = _nf_flow(c, hidden, steps, side)
    sd = export_nf_head(head, num_patches=side * side)
    back, perms = convert_nf_head(sd, flow_steps=steps)
    np.testing.assert_array_equal(
        np.asarray(perms), default_perms(steps, c)
    )
    for leaf, v in head["params"].items():
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), back["params"][leaf], err_msg=leaf
        )


def test_export_cli_from_run_dir(tmp_path):
    """export_weights CLI: a run directory (config.json + orbax best_params)
    exports to a .pth that our own legacy validate path converts back."""
    from vit_ad_tpu.cli.export_weights import main as export_main
    from vit_ad_tpu.utils.checkpoint import save_params

    d, k = 8, 4
    _, head = _mdn_head(d, k)
    run_dir = tmp_path / "run"
    os.makedirs(run_dir)
    with open(run_dir / "config.json", "w") as f:
        json.dump({"architecture": "mdn", "model_name": "enc_deit",
                   "num_gaussians": k, "img_size": 32}, f)
    save_params(str(run_dir), "best_params", head)

    dst = tmp_path / "exported.pth"
    rc = export_main(["--run", str(run_dir), "--dst", str(dst)])
    assert rc == 0 and dst.exists()

    sd = state_dict_to_numpy(torch.load(dst, weights_only=True))
    back = convert_mdn_head(sd)["params"]
    for leaf, v in head["params"].items():
        np.testing.assert_array_equal(np.asarray(v, np.float32), back[leaf])
