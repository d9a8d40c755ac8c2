"""AOT serving bundles (serving/aot.py + cli/export_serving.py): the
jax.export'd scoring graph must reproduce the live evaluators' scores
bit-tight, pad arbitrary set sizes, and lower for platforms the exporting
host doesn't have.

The reference has no deployment artifact at all — serving a reference model
requires the full torch model zoo per .pth (reference validation_loop.py:
248-274); these tests lock the rebuild's self-contained-artifact story."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo root (startTraining_* live there)


def _rand_images(n, img=32, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (n, img, img, 3), dtype=np.uint8
    )


def _files_pipeline(ims, tmp_path, batch=4):
    """Write uint8 images as PNGs and build a files= DataPipeline over them
    (the score CLI's input path) — decode round-trips losslessly."""
    import PIL.Image

    from vit_ad_tpu.data.loader import DataPipeline

    paths = []
    for i, im in enumerate(ims):
        p = str(tmp_path / f"{i:03d}.png")
        PIL.Image.fromarray(im).save(p)
        paths.append(p)
    return DataPipeline(batch_size=batch, img_size=ims.shape[1], files=paths)


def _nf_models(img=32, flow_steps=3):
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.models.flow import NormalizingFlow
    from vit_ad_tpu.pipeline.loading import RunModels
    from vit_ad_tpu.pipeline.train import default_encoder_params
    from vit_ad_tpu.registry import get_model

    hp = HyperParams(model_name="enc_cnn", architecture="nf", img_size=img,
                     hidden_ratio=0.5, flow_steps=flow_steps, batch_size=4)
    enc = get_model("enc_cnn", img, hp.dtypes)
    ep = default_encoder_params(enc, hp)
    p = enc.num_patches
    flow = NormalizingFlow(
        num_channels=enc.embed_dim, img_size=img, num_patches=p,
        hidden_ratio=0.5, flow_steps=flow_steps, dtypes=hp.dtypes,
    )
    side = int(np.sqrt(p))
    head = flow.init(jax.random.key(0),
                     jnp.zeros((1, side, side, enc.embed_dim)))
    return RunModels(kind="nf", hp=hp, parts=(enc, ep, flow, head))


def test_nf_bundle_matches_live_scoring(tmp_path):
    """Exported NF bundle ≡ score_nf on the same image set, including a set
    size that does NOT divide the baked batch (pad-and-trim path)."""
    from vit_ad_tpu.pipeline.loading import score_models
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    m = _nf_models()
    ims = _rand_images(10)  # batch 4 → 2 full chunks + padded tail
    bdir = tmp_path / "bundle"
    manifest = export_bundle(m, str(bdir), batch=4)
    assert manifest["kind"] == "nf"
    assert (bdir / "scorer.bin").exists()
    assert json.loads((bdir / "manifest.json").read_text())["batch"] == 4

    bundle = load_bundle(str(bdir))
    scores, maps = bundle.score(ims)

    live = score_models(m, _files_pipeline(ims, tmp_path))
    np.testing.assert_allclose(scores, live.image_scores, rtol=0, atol=1e-6)
    np.testing.assert_allclose(maps, live.pixel_scores, rtol=0, atol=1e-6)


def test_recon_bundle_matches_live_scoring(tmp_path):
    """Recon (full AE graph) bundle parity."""
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.pipeline.loading import RunModels, score_models
    from vit_ad_tpu.registry import get_model
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    img = 32
    hp = HyperParams(model_name="ae_cnn", architecture="recon", img_size=img)
    model = get_model("ae_cnn", img, hp.dtypes)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, img, img, 3), jnp.float32),
        train=True,
    )
    m = RunModels(kind="recon", hp=hp, parts=(model, variables))

    ims = _rand_images(6)
    bdir = tmp_path / "bundle"
    export_bundle(m, str(bdir), batch=4)
    scores, maps = load_bundle(str(bdir)).score(ims)

    live = score_models(m, _files_pipeline(ims, tmp_path))
    np.testing.assert_allclose(scores, live.image_scores, rtol=0, atol=1e-6)
    np.testing.assert_allclose(maps, live.pixel_scores, rtol=0, atol=1e-6)


def test_mdn_resnet_bundle_tuple_payload(tmp_path):
    """Multi-stage ResNet-MDN: the exported payload is a TUPLE of per-stage
    log-liks; bundle scores ≡ score_mdn_resnet (incl. the global-set MDN
    normalization applied on host, not in-graph)."""
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.models.resnet import STAGE_CHANNELS, ResNetEncoder
    from vit_ad_tpu.pipeline.loading import RunModels, score_models
    from vit_ad_tpu.pipeline.train import default_encoder_params
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    img = 32
    hp = HyperParams(model_name="res_net", architecture="mdn", img_size=img,
                     num_gaussians=2)
    encoder = ResNetEncoder(img_size=img, dtypes=hp.dtypes)
    ev = default_encoder_params(encoder, hp)
    stages = (2, 3)
    mdns = [GaussianMDN(features=STAGE_CHANNELS[i], num_gaussians=2)
            for i in stages]
    heads = [
        m.init(jax.random.key(0), jnp.zeros((1, 1, STAGE_CHANNELS[i])))
        for i, m in zip(stages, mdns)
    ]
    m = RunModels(kind="mdn_resnet", hp=hp, stages=stages,
                  parts=(encoder, ev, mdns, heads))

    ims = _rand_images(5)
    bdir = tmp_path / "bundle"
    export_bundle(m, str(bdir), batch=4)
    bundle = load_bundle(str(bdir))
    payload = bundle.payloads(ims)
    assert isinstance(payload, tuple) and len(payload) == 2
    scores, maps = bundle.score(ims)

    live = score_models(m, _files_pipeline(ims, tmp_path))
    np.testing.assert_allclose(scores, live.image_scores, rtol=0, atol=1e-6)
    np.testing.assert_allclose(maps, live.pixel_scores, rtol=0, atol=1e-6)


def test_multi_platform_export_and_shape_guard(tmp_path):
    """platforms=['cpu','tpu'] lowers on a CPU-only host (serialize on a dev
    box, serve on TPU) and still executes locally; wrong-shaped inputs are
    rejected with a clear error."""
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    m = _nf_models()
    bdir = tmp_path / "bundle"
    manifest = export_bundle(m, str(bdir), batch=4, platforms=["cpu", "tpu"])
    assert manifest["platforms"] == ["cpu", "tpu"]
    bundle = load_bundle(str(bdir))
    scores, _ = bundle.score(_rand_images(4))
    assert np.all(np.isfinite(scores))
    with pytest.raises(ValueError, match="expects"):
        bundle.score(_rand_images(4, img=16))


def test_export_cli_roundtrip_from_trained_run(tmp_path):
    """End-to-end product path: train a tiny run through the real CLI,
    export it with the export_serving CLI, and the bundle must reproduce the
    score CLI's per-image scores on the labeled test folder."""
    import csv

    import startTraining_mdn
    from vit_ad_tpu.cli.export_serving import main as export_main
    from vit_ad_tpu.cli.score import list_images, main as score_main
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.serving.aot import load_bundle

    root = tmp_path / "data"
    make_mvtec_category(str(root), "cat", img_size=32, n_train=12,
                        n_test_good=3, n_test_defect=3)
    category = f"{root}/cat"

    workdir = tmp_path / "run"
    workdir.mkdir()
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        startTraining_mdn.main([
            "-m", "enc_cnn", "-n", "2", "-e", "2", "-p", "2", "-b", "4",
            "-i", "32", "-l", "3e-3", "-d", category, "-t", "train/good",
            "-v", "test",
        ])
    finally:
        os.chdir(cwd)
    import glob

    runs = glob.glob(str(workdir / "runs" / "*"))
    assert len(runs) == 1
    run = runs[0]

    bdir = tmp_path / "bundle"
    rc = export_main(["-r", run, "-o", str(bdir), "-b", "4"])
    assert rc == 0
    manifest = json.loads((bdir / "manifest.json").read_text())
    assert manifest["kind"] == "mdn" and manifest["source"] == run

    out = tmp_path / "scores_out"
    assert score_main(["-r", run, "-d", f"{category}/test",
                       "-o", str(out)]) == 0
    with open(out / "scores.csv") as f:
        rows = list(csv.DictReader(f))
    cli_scores = {r["path"]: float(r["image_score"]) for r in rows}

    files = list_images(f"{category}/test")
    scores, maps = load_bundle(str(bdir)).score_files(files)
    assert maps.shape == (len(files), 32, 32)
    # 6 images, batch 4 → padded tail chunk; MDN normalization is global
    # over the whole set in BOTH paths, so scores agree bit-tight
    for p, s in zip(files, scores):
        assert s == pytest.approx(cli_scores[p], abs=1e-6), p


def _mdn_models(img=32):
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.pipeline.loading import RunModels
    from vit_ad_tpu.pipeline.train import default_encoder_params
    from vit_ad_tpu.registry import get_model

    hp = HyperParams(model_name="enc_cnn", architecture="mdn", img_size=img,
                     num_gaussians=2, batch_size=4)
    enc = get_model("enc_cnn", img, hp.dtypes)
    ep = default_encoder_params(enc, hp)
    mdn = GaussianMDN(features=enc.embed_dim, num_gaussians=2)
    mp = mdn.init(jax.random.key(1), jnp.zeros((1, 1, enc.embed_dim)))
    return RunModels(kind="mdn", hp=hp, parts=(enc, ep, mdn, mp))


def test_gate_registry_covers_every_source_gate():
    """ops/pallas/gates.ALL_GATES is THE registry: every VITAD_PALLAS_* env
    gate referenced anywhere in the package must be listed (the round-3
    advisor found VITAD_PALLAS_VIT_ATTN missing from the portable-export
    blocklist — a default-on TPU kernel leaking into 'portable' exports)."""
    import pathlib
    import re

    from vit_ad_tpu.ops.pallas.gates import ALL_GATES

    pkg = pathlib.Path(__file__).resolve().parent.parent / "vit_ad_tpu"
    found = set()
    for path in pkg.rglob("*.py"):
        if path.name == "gates.py":
            continue
        found |= set(re.findall(r"VITAD_PALLAS_[A-Z_0-9]+", path.read_text()))
    assert found == set(ALL_GATES), (
        f"gate registry drift: source gates {sorted(found)} vs registry "
        f"{sorted(ALL_GATES)} — update vit_ad_tpu/ops/pallas/gates.py"
    )


def test_portable_env_blocks_all_gates():
    from vit_ad_tpu.ops.pallas.gates import ALL_GATES
    from vit_ad_tpu.serving.aot import _PORTABLE_ENV

    assert _PORTABLE_ENV == {g: "0" for g in ALL_GATES}
    # the specific regression the advisor caught
    assert "VITAD_PALLAS_VIT_ATTN" in _PORTABLE_ENV


def test_empty_input_rejected(tmp_path):
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    m = _nf_models()
    bdir = tmp_path / "bundle"
    export_bundle(m, str(bdir), batch=4)
    bundle = load_bundle(str(bdir))
    with pytest.raises(ValueError, match="no images"):
        bundle.score(np.zeros((0, 32, 32, 3), np.uint8))


def test_mdn_baked_normalizer_cross_call_comparable(tmp_path):
    """export_bundle(ref_images=...) bakes the reference set's max
    log-likelihood: scores become identical for the same image regardless
    of what else is in the call (deployment thresholds hold across waves),
    while normalizer='call' reproduces the reference per-call-set
    semantics bit-tight."""
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    m = _mdn_models()
    ims = _rand_images(6)
    bdir = tmp_path / "bundle"
    export_bundle(m, str(bdir), batch=4, ref_images=ims)
    bundle = load_bundle(str(bdir))
    assert "ref_max_loglik" in bundle.manifest
    assert len(bundle.manifest["ref_max_loglik"]) == 1

    # cross-call comparability: image 0 scored alone == scored in the set
    s_all, p_all = bundle.score(ims)
    s_solo, p_solo = bundle.score(ims[:1])
    np.testing.assert_allclose(s_solo[0], s_all[0], atol=1e-6)
    np.testing.assert_allclose(p_solo[0], p_all[0], atol=1e-6)

    # ref set == scored set → the baked max equals the per-call max, so
    # auto ≡ call (and ≡ the pre-normalizer behavior) on the full set
    s_call, p_call = bundle.score(ims, normalizer="call")
    np.testing.assert_allclose(s_all, s_call, atol=1e-7)
    np.testing.assert_allclose(p_all, p_call, atol=1e-7)

    with pytest.raises(ValueError, match="normalizer"):
        bundle.score(ims, normalizer="bogus")


def test_serving_site_needs_no_flax(tmp_path):
    """The deployment claim, enforced: loading + scoring a bundle must not
    pull flax, the model zoo, or the pipeline into the import graph
    (serving/aot.py module docstring)."""
    import pathlib
    import subprocess
    import sys

    from vit_ad_tpu.serving.aot import export_bundle

    m = _nf_models()
    bdir = tmp_path / "bundle"
    export_bundle(m, str(bdir), batch=4)

    code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys
import numpy as np
from vit_ad_tpu.serving.aot import load_bundle
b = load_bundle({str(bdir)!r})
ims = np.random.default_rng(0).integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
s, maps = b.score(ims)
assert s.shape == (3,) and maps.shape == (3, 32, 32)
leaked = [k for k in sys.modules
          if k == "flax" or k.startswith("flax.")
          or k.startswith("vit_ad_tpu.models")
          or k.startswith("vit_ad_tpu.pipeline")
          or k.startswith("vit_ad_tpu.registry")]
assert not leaked, f"serving import graph leaked: {{leaked}}"
"""
    repo_root = pathlib.Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=repo_root,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr


def test_external_weights_bundle_matches_baked(tmp_path):
    """weights='external' (program + weights.npz, params as inputs) must
    score identically to the baked bundle — the variant exists for
    runtimes whose compile RPC rejects large serialized modules (a baked
    DeiT-base bundle hit the axon tunnel's HTTP 413 limit)."""
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    m = _nf_models()
    ims = _rand_images(6)
    baked_dir, ext_dir = tmp_path / "baked", tmp_path / "ext"
    export_bundle(m, str(baked_dir), batch=4)
    manifest = export_bundle(m, str(ext_dir), batch=4, weights="external")
    assert manifest["weights"] == "external"
    assert (ext_dir / "weights.npz").exists()
    # the external module stays small: no param constants inside
    assert (ext_dir / "scorer.bin").stat().st_size < \
        (baked_dir / "scorer.bin").stat().st_size

    s_b, p_b = load_bundle(str(baked_dir)).score(ims)
    s_e, p_e = load_bundle(str(ext_dir)).score(ims)
    np.testing.assert_allclose(s_e, s_b, rtol=0, atol=1e-6)
    np.testing.assert_allclose(p_e, p_b, rtol=0, atol=1e-6)


def test_external_weights_mdn_resnet_tuple(tmp_path):
    """External weights with the hardest param structure: the two-model
    multi-stage ResNet-MDN (encoder variables dict + list of head dicts)."""
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.models.resnet import STAGE_CHANNELS, ResNetEncoder
    from vit_ad_tpu.pipeline.loading import RunModels
    from vit_ad_tpu.pipeline.train import default_encoder_params
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    img = 32
    hp = HyperParams(model_name="res_net", architecture="mdn", img_size=img,
                     num_gaussians=2)
    encoder = ResNetEncoder(img_size=img, dtypes=hp.dtypes)
    ev = default_encoder_params(encoder, hp)
    stages = (2, 3)
    mdns = [GaussianMDN(features=STAGE_CHANNELS[i], num_gaussians=2)
            for i in stages]
    heads = [
        mm.init(jax.random.key(0), jnp.zeros((1, 1, STAGE_CHANNELS[i])))
        for i, mm in zip(stages, mdns)
    ]
    m = RunModels(kind="mdn_resnet", hp=hp, stages=stages,
                  parts=(encoder, ev, mdns, heads))
    ims = _rand_images(5)
    b_dir, e_dir = tmp_path / "b", tmp_path / "e"
    export_bundle(m, str(b_dir), batch=4)
    export_bundle(m, str(e_dir), batch=4, weights="external")
    s_b, p_b = load_bundle(str(b_dir)).score(ims)
    s_e, p_e = load_bundle(str(e_dir)).score(ims)
    np.testing.assert_allclose(s_e, s_b, rtol=0, atol=1e-6)
    np.testing.assert_allclose(p_e, p_b, rtol=0, atol=1e-6)


def test_scores_only_bundle_nf(tmp_path):
    """payload='scores' folds the image-score tail in-graph: [B] floats
    per chunk instead of full-resolution maps (~100,000x less fetch on
    bandwidth-limited serving links), identical image scores."""
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    m = _nf_models()
    ims = _rand_images(6)
    full_dir, s_dir = tmp_path / "full", tmp_path / "scores"
    export_bundle(m, str(full_dir), batch=4)
    manifest = export_bundle(m, str(s_dir), batch=4, payload="scores")
    assert manifest["payload"] == "scores"

    s_full, maps = load_bundle(str(full_dir)).score(ims)
    s_only, none_maps = load_bundle(str(s_dir)).score(ims)
    assert none_maps is None
    assert s_only.shape == (6,)
    np.testing.assert_allclose(s_only, s_full, rtol=0, atol=1e-6)


def test_scores_only_mdn_needs_and_uses_ref_normalizer(tmp_path):
    from vit_ad_tpu.serving.aot import export_bundle, load_bundle

    m = _mdn_models()
    ims = _rand_images(6)
    with pytest.raises(ValueError, match="ref_images"):
        export_bundle(m, str(tmp_path / "x"), batch=4, payload="scores")

    full_dir, s_dir = tmp_path / "full", tmp_path / "scores"
    export_bundle(m, str(full_dir), batch=4, ref_images=ims)
    export_bundle(m, str(s_dir), batch=4, ref_images=ims, payload="scores")
    s_full, _ = load_bundle(str(full_dir)).score(ims)  # auto → baked ref
    s_only, maps = load_bundle(str(s_dir)).score(ims)
    assert maps is None
    np.testing.assert_allclose(s_only, s_full, rtol=0, atol=1e-6)


def test_scores_tail_matches_host_tail_all_kinds():
    """_scores_tail (the in-graph scores-only tail) must reproduce
    scoring.payload_to_scores's image scores for every kind on synthetic
    payloads — incl. the multi-stage mdn_resnet upsample+mean+max path."""
    import jax.numpy as jnp

    from vit_ad_tpu.scoring import payload_ref_max_ll, payload_to_scores
    from vit_ad_tpu.serving.aot import _scores_tail

    rng = np.random.default_rng(3)
    img = 16
    # nf/recon/nf_resnet: [N,H,W] maps
    maps = rng.standard_normal((5, img, img)).astype(np.float32)
    for kind in ("nf", "recon", "nf_resnet"):
        want, _ = payload_to_scores(kind, maps, img)
        got = np.asarray(_scores_tail(kind, img, None)(jnp.asarray(maps)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    # mdn: [N,P] log-liks with baked normalizer
    ll = -np.abs(rng.standard_normal((5, 9))).astype(np.float32) - 1.0
    rm = payload_ref_max_ll("mdn", ll)
    want, _ = payload_to_scores("mdn", ll, img, ref_max_ll=rm)
    got = np.asarray(_scores_tail("mdn", img, rm)(jnp.asarray(ll)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # mdn_resnet: tuple of per-stage log-liks (different P per stage)
    payload = (
        -np.abs(rng.standard_normal((5, 16))).astype(np.float32) - 1.0,
        -np.abs(rng.standard_normal((5, 4))).astype(np.float32) - 1.0,
    )
    rms = payload_ref_max_ll("mdn_resnet", payload)
    want, _ = payload_to_scores("mdn_resnet", payload, img, ref_max_ll=rms)
    got = np.asarray(
        _scores_tail("mdn_resnet", img, rms)(tuple(map(jnp.asarray, payload)))
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
