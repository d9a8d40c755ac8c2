"""Multi-stage ResNet-trunk run export: one reference-layout `.pth` per
stage head (the artifact set the reference's own training leaves behind,
reference TrainingsHelper.py:112-122 over models=mdn_list / nf_list) plus
the trained ResNetEncoder — which the reference never saves, so its trained
stage LayerNorms are unrecoverable there (CnnEncoder.py:150-158). The MDN
stage filenames parse under BOTH frameworks' two-file validate conventions
(reference validation_loop.py:91-95)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import test_legacy_pth as tlp
from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.models.resnet import STAGE_CHANNELS, STAGE_SCALES, ResNetEncoder
from vit_ad_tpu.utils import torch_convert as tc
from vit_ad_tpu.utils.checkpoint import save_params

F32 = DtypePolicy.f32()
IMG = 64


def _tree_equal(a, b, msg=""):
    ja, jb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(ja) == len(jb), msg
    for x, y in zip(ja, jb):
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32), err_msg=msg
        )


def _make_encoder_vars(hp):
    """Mirror pipeline.loading._build_resnet_models' encoder init exactly
    (same seed split) so the saved checkpoint restores into its target."""
    encoder = ResNetEncoder(img_size=hp.img_size, dtypes=hp.dtypes)
    return encoder.init(
        jax.random.split(jax.random.key(hp.seed))[1],
        jnp.zeros((1, hp.img_size, hp.img_size, 3), jnp.float32),
    )


def _make_mdn_run(tmp_path, k=3):
    from vit_ad_tpu.models.mdn import GaussianMDN

    hp = HyperParams(model_name="res_net", architecture="mdn",
                     img_size=IMG, num_gaussians=k, data_class="synth")
    enc_vars = _make_encoder_vars(hp)
    rng = jax.random.key(11)
    heads = []
    for i in (2, 3):
        rng, sub = jax.random.split(rng)
        mdn = GaussianMDN(features=STAGE_CHANNELS[i], num_gaussians=k)
        heads.append(mdn.init(sub, jnp.zeros((1, 1, STAGE_CHANNELS[i]))))
    run_dir = tmp_path / "run"
    os.makedirs(run_dir)
    with open(run_dir / "config.json", "w") as f:
        json.dump({"architecture": "mdn", "model_name": "res_net",
                   "num_gaussians": k, "img_size": IMG,
                   "data_class": "synth"}, f)
    save_params(str(run_dir), "best_params",
                {"heads": heads, "encoder": enc_vars["params"]})
    return run_dir, heads, enc_vars, k


def test_mdn_resnet_export_reference_convention(tmp_path):
    from vit_ad_tpu.cli.export_weights import main as export_main
    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.pipeline.loading import parse_pth_filename

    run_dir, heads, enc_vars, k = _make_mdn_run(tmp_path)
    dst = tmp_path / "exported"
    rc = export_main(["--run", str(run_dir), "--dst", str(dst)])
    assert rc == 0

    stage_files = [dst / f"{k}_stage{i}_synth.pth" for i in (2, 3)]
    enc_file = dst / "ResNetEncoder_synth.pth"
    for p in (*stage_files, enc_file):
        assert p.exists(), p

    # the reference's validate_mdn_resnet filename parse (leading gaussian
    # count, trailing dataclass) — shared with our own loader
    ng, dataclass = parse_pth_filename(str(stage_files[0]), "mdn")
    assert (ng, dataclass) == (k, "synth")

    # each stage file strict-loads into the reference torch GMM and matches
    # our head's forward
    rng = np.random.default_rng(0)
    for (si, path), head in zip(((2, stage_files[0]), (3, stage_files[1])),
                                heads):
        d = STAGE_CHANNELS[si]
        tm = tlp.TorchGMDN(d, k)
        tm.load_state_dict(torch.load(path, weights_only=True), strict=True)
        tm.eval()
        mdn = GaussianMDN(features=d, num_gaussians=k, dtypes=F32)
        x = rng.normal(size=(2, 3, d)).astype(np.float32)
        with torch.no_grad():
            pi_t, sigma_t, mu_t = tm(torch.from_numpy(x))
        out = mdn.apply(head, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out.pi), pi_t.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.sigma), sigma_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.mu), mu_t.numpy(),
                                   rtol=1e-4, atol=1e-5)

    # the encoder file round-trips bit-exactly through the strict importer
    # (incl. the trained stage norms the reference cannot restore at all)
    sd = tc.state_dict_to_numpy(torch.load(enc_file, weights_only=True))
    back = tc.convert_resnet_encoder(sd)
    _tree_equal(back["params"], enc_vars["params"], "encoder params")
    _tree_equal(back["batch_stats"], enc_vars["batch_stats"], "batch stats")


def test_mdn_resnet_export_reimports_with_encoder(tmp_path):
    """Full interop loop: export a run, rebuild through the legacy two-file
    path with -E pointing at the exported encoder — heads AND trained stage
    norms restore bit-exactly."""
    from vit_ad_tpu.cli.export_weights import main as export_main
    from vit_ad_tpu.pipeline.loading import build_pth_resnet_mdn_models

    run_dir, heads, enc_vars, k = _make_mdn_run(tmp_path)
    dst = tmp_path / "exported"
    assert export_main(["--run", str(run_dir), "--dst", str(dst)]) == 0

    m = build_pth_resnet_mdn_models(
        str(dst / f"{k}_stage2_synth.pth"),
        str(dst / f"{k}_stage3_synth.pth"),
        img_size=IMG,
        encoder_ckpt=str(dst / "ResNetEncoder_synth.pth"),
    )
    assert m.kind == "mdn_resnet" and m.stages == (2, 3)
    assert m.hp.num_gaussians == k and m.hp.data_class == "synth"
    _, enc_back, _, heads_back = m.parts
    for orig, back in zip(heads, heads_back):
        _tree_equal(back["params"], orig["params"], "head params")
    _tree_equal(enc_back["params"], enc_vars["params"], "encoder params")


def test_nf_resnet_export_roundtrip(tmp_path):
    from vit_ad_tpu.cli.export_weights import main as export_main
    from vit_ad_tpu.models.flow import NormalizingFlow, default_perms

    hp = HyperParams(model_name="res_net", architecture="nf", img_size=IMG,
                     hidden_ratio=0.5, flow_steps=2, data_class="synth")
    enc_vars = _make_encoder_vars(hp)
    heads = []
    for i in (0, 1, 2):
        side = IMG // STAGE_SCALES[i]
        flow = NormalizingFlow(
            num_channels=STAGE_CHANNELS[i], img_size=IMG,
            num_patches=side * side, hidden_ratio=hp.hidden_ratio,
            flow_steps=hp.flow_steps,
        )
        heads.append(flow.init(
            jax.random.key(20 + i),
            jnp.zeros((1, side, side, STAGE_CHANNELS[i]))))
    run_dir = tmp_path / "run"
    os.makedirs(run_dir)
    with open(run_dir / "config.json", "w") as f:
        json.dump({"architecture": "nf", "model_name": "res_net",
                   "img_size": IMG, "hidden_ratio": 0.5, "flow_steps": 2,
                   "data_class": "synth"}, f)
    save_params(str(run_dir), "best_params",
                {"heads": heads, "encoder": enc_vars["params"]})

    dst = tmp_path / "exported"
    assert export_main(["--run", str(run_dir), "--dst", str(dst)]) == 0

    for i, head in zip((0, 1, 2), heads):
        path = dst / f"NormalizingFlow_{i}_synth.pth"
        assert path.exists(), path
        sd = tc.state_dict_to_numpy(torch.load(path, weights_only=True))
        # unused layer_norm member carries the per-stage map shape
        side = IMG // STAGE_SCALES[i]
        assert sd["layer_norm.weight"].shape == (STAGE_CHANNELS[i], side, side)
        back, perms = tc.convert_nf_head(sd, flow_steps=hp.flow_steps)
        np.testing.assert_array_equal(
            np.asarray(perms),
            default_perms(hp.flow_steps, STAGE_CHANNELS[i]))
        for leaf, v in head["params"].items():
            np.testing.assert_array_equal(
                np.asarray(v, np.float32), back["params"][leaf], err_msg=leaf)
    assert (dst / "ResNetEncoder_synth.pth").exists()


def test_multistage_export_rejects_single_pth_dst(tmp_path):
    run_dir, *_ = _make_mdn_run(tmp_path)
    from vit_ad_tpu.cli.export_weights import main as export_main

    rc = export_main(["--run", str(run_dir), "--dst",
                      str(tmp_path / "one.pth")])
    assert rc == 2
