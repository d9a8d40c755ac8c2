"""Label-free folder scoring (cli/score.py): a run dir + ANY image folder →
per-image anomaly scores, consistent with the labeled evaluator's scores.

The reference has no serving-side entry point (validation_loop needs the
MVTec directory contract with ground-truth masks); this locks the rebuild's
scoring CLI to the validators' exact score semantics."""

import csv
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo root (startTraining_* live there)


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    from vit_ad_tpu.data.synthetic import make_mvtec_category

    root = tmp_path_factory.mktemp("mvtec_score")
    make_mvtec_category(
        str(root), "cat", img_size=32, n_train=16, n_test_good=4,
        n_test_defect=4,
    )
    return f"{root}/cat"


@pytest.fixture(scope="module")
def run_dir(category, tmp_path_factory):
    """Train a tiny MDN run through the real CLI (writes config.json +
    best_params* the way every product run does)."""
    import startTraining_mdn

    workdir = tmp_path_factory.mktemp("score_run")
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        result = startTraining_mdn.main(
            [
                "-m", "enc_deit", "-n", "3", "-e", "3", "-p", "2", "-b", "8",
                "-i", "32", "-l", "3e-3", "-d", category, "-t", "train/good",
                "-v", "test",
            ]
        )
    finally:
        os.chdir(cwd)
    import glob

    runs = glob.glob(str(workdir / "runs" / "*"))
    assert len(runs) == 1
    return runs[0], result.metrics


def test_score_folder_matches_evaluator(category, run_dir, tmp_path):
    """Scoring the labeled test folder label-free must reproduce the
    training-time eval AUROC exactly: same models, same per-image scores
    (MDN's global normalization is order-independent over a fixed set)."""
    from vit_ad_tpu.cli.score import main as score_main
    from vit_ad_tpu.data.dataset import infer_label
    from vit_ad_tpu.pipeline.metrics import roc_auc_score

    run, train_metrics = run_dir
    out = tmp_path / "scores_out"
    rc = score_main([
        "-r", run, "-d", f"{category}/test", "-o", str(out),
        "--heatmaps", "2",
    ])
    assert rc == 0

    with open(out / "scores.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 8  # 4 good + 4 defect
    scores = np.array([float(r["image_score"]) for r in rows])
    labels = np.array([infer_label(r["path"]) for r in rows])
    assert np.all(np.isfinite(scores))
    auroc = roc_auc_score(labels, scores)
    assert auroc == pytest.approx(train_metrics["image_auroc_score"], abs=1e-9)

    summary = json.loads((out / "summary.json").read_text())
    assert summary["images"] == 8
    assert summary["arch"] == "mdn"
    assert summary["score_max"] == pytest.approx(scores.max())

    pngs = list((out / "heatmaps").glob("*.png"))
    assert len(pngs) == 2


def test_score_pth_legacy_weights(category, tmp_path, monkeypatch):
    """--pth mode: reference-format legacy weights score a folder directly
    (the migration path: keep your trained .pth, point at images); scores
    must agree with validate_pth's labeled evaluation of the same folder."""
    import torch

    import validation_loop as vl
    from test_legacy_pth import TorchGMDN
    from vit_ad_tpu.cli.score import main as score_main
    from vit_ad_tpu.config import DtypePolicy
    from vit_ad_tpu.data.dataset import infer_label
    from vit_ad_tpu.models.vit import ViTEncoder
    from vit_ad_tpu.pipeline.metrics import roc_auc_score

    d = 32
    torch.manual_seed(7)
    pth = tmp_path / "4_gaussians_600-epochs_cat.pth"
    torch.save(TorchGMDN(d, 4).state_dict(), pth)

    def tiny_get_model(name, img_size, dtypes):
        return ViTEncoder(img_size=img_size, patch_size=8, embed_dim=d,
                          depth=2, num_heads=4, num_prefix_tokens=2,
                          dtypes=DtypePolicy.f32())

    import vit_ad_tpu.registry

    monkeypatch.setattr(vit_ad_tpu.registry, "get_model", tiny_get_model)

    out = tmp_path / "out"
    root = os.path.dirname(category)
    rc = score_main([
        "--pth", str(pth), "-a", "mdn", "-m", "enc_deit", "-i", "32",
        "-d", f"{category}/test", "-o", str(out),
    ])
    assert rc == 0
    with open(out / "scores.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 8
    scores = np.array([float(r["image_score"]) for r in rows])
    labels = np.array([infer_label(r["path"]) for r in rows])
    auroc = roc_auc_score(labels, scores)

    ref = vl.validate_pth(str(pth), "enc_deit", "mdn", root, img_size=32)
    assert auroc == pytest.approx(ref["image_auroc_score"], abs=1e-9)


def test_score_folder_mesh_matches_single_device(category, run_dir, tmp_path):
    """Multi-chip serving: --mesh 4x2 scoring over the virtual 8-device CPU
    mesh reproduces single-device scores (DP batch sharding is a pure
    scheduling change)."""
    from vit_ad_tpu.cli.score import score_folder

    run, _ = run_dir
    single = score_folder(run, f"{category}/test",
                          out_dir=str(tmp_path / "single"))
    meshed = score_folder(run, f"{category}/test",
                          out_dir=str(tmp_path / "mesh"), mesh="4x2")
    with open(tmp_path / "single" / "scores.csv") as f:
        s_rows = list(csv.DictReader(f))
    with open(tmp_path / "mesh" / "scores.csv") as f:
        m_rows = list(csv.DictReader(f))
    assert [r["path"] for r in s_rows] == [r["path"] for r in m_rows]
    s_scores = np.array([float(r["image_score"]) for r in s_rows])
    m_scores = np.array([float(r["image_score"]) for r in m_rows])
    # run-dir models rebuild at the default bf16 compute policy
    # (hp_from_config drops 'dtypes'), and splitting the batch across
    # devices changes matmul tiling → bf16 rounding drift of ~1e-3 on these
    # O(0.1) scores. The f32 exact-parity check lives in
    # test_eval_scan.test_evaluate_nf_mesh_scoring; here we lock the
    # serving-level invariant: near-identical scores, same top hit.
    np.testing.assert_allclose(m_scores, s_scores, rtol=2e-2, atol=5e-3)
    assert int(np.argmax(m_scores)) == int(np.argmax(s_scores))
    assert meshed["images"] == single["images"]


def test_score_folder_unlabeled_flat_dir(run_dir, tmp_path):
    """A flat folder of images with no dataset layout at all (the serving
    case) scores without labels, masks, or directory contracts."""
    from PIL import Image

    from vit_ad_tpu.cli.score import score_folder

    run, _ = run_dir
    img_dir = tmp_path / "fresh"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i}.png")

    summary = score_folder(run, str(img_dir), out_dir=str(tmp_path / "out"))
    assert summary["images"] == 3
    with open(tmp_path / "out" / "scores.csv") as f:
        rows = list(csv.DictReader(f))
    assert [os.path.basename(r["path"]) for r in rows] == [
        "img_0.png", "img_1.png", "img_2.png",
    ]
    assert all(np.isfinite(float(r["image_score"])) for r in rows)


def test_score_watch_incremental(category, run_dir, tmp_path):
    """--watch serving: a first watch scores what is there; new images
    arriving later are scored WITHOUT rescoring (or rewriting) earlier rows,
    resuming from the existing scores.csv like a restarted server would."""
    import glob
    import shutil

    from vit_ad_tpu.cli.score import main as score_main

    run, _ = run_dir
    src = tmp_path / "incoming"
    src.mkdir()
    pool = sorted(glob.glob(f"{category}/test/good/*")) + sorted(
        glob.glob(f"{category}/test/crack/*")
    )
    assert len(pool) >= 5
    for i, f in enumerate(pool[:3]):
        shutil.copy(f, src / f"frame_{i:03d}.png")

    out = tmp_path / "watch_out"
    rc = score_main([
        "-r", run, "-d", str(src), "-o", str(out),
        "--watch", "0.01", "--watch-waves", "1",
    ])
    assert rc == 0
    first = (out / "scores.csv").read_text().splitlines()
    assert len(first) == 1 + 3  # header + 3 scored

    # two more frames arrive; a resumed watch (2 waves: the second finds
    # nothing new) scores only the new frames and keeps old rows verbatim
    for i, f in enumerate(pool[3:5], start=3):
        shutil.copy(f, src / f"frame_{i:03d}.png")
    rc = score_main([
        "-r", run, "-d", str(src), "-o", str(out),
        "--watch", "0.01", "--watch-waves", "2",
    ])
    assert rc == 0
    lines = (out / "scores.csv").read_text().splitlines()
    assert lines[:4] == first  # earlier rows untouched
    assert len(lines) == 1 + 5
    scores = [float(r.split(",")[1]) for r in lines[1:]]
    assert all(np.isfinite(scores))

    summary = json.loads((out / "summary.json").read_text())
    assert summary["images"] == 5
    assert summary["waves"] == 2
    assert summary["last_wave"]["n"] == 2


def test_score_watch_corrupt_file_isolated(category, run_dir, tmp_path):
    """A mid-copy/corrupt image cannot drop its wave: good files in the same
    wave are scored via the per-file fallback, the bad file retries, and
    after 3 failed waves it gets a NaN row so the watcher moves on."""
    import glob
    import shutil

    from vit_ad_tpu.cli.score import main as score_main

    run, _ = run_dir
    src = tmp_path / "incoming"
    src.mkdir()
    pool = sorted(glob.glob(f"{category}/test/good/*"))
    for i, f in enumerate(pool[:2]):
        shutil.copy(f, src / f"frame_{i:03d}.png")
    torn = src / "frame_torn.png"
    torn.write_bytes((src / "frame_000.png").read_bytes()[:40])

    out = tmp_path / "watch_out"
    rc = score_main([
        "-r", run, "-d", str(src), "-o", str(out),
        "--watch", "0.01", "--watch-waves", "3",
    ])
    assert rc == 0
    with open(out / "scores.csv") as f:
        rows = list(csv.DictReader(f))
    by_path = {os.path.basename(r["path"]): float(r["image_score"])
               for r in rows}
    assert len(by_path) == 3
    assert np.isfinite(by_path["frame_000.png"])
    assert np.isfinite(by_path["frame_001.png"])
    assert np.isnan(by_path["frame_torn.png"])


def test_score_watch_resume_validates_rows_and_realpaths(
    category, run_dir, tmp_path
):
    """Resume hardening: a torn final CSV row is rescored (not trusted), and
    dedup keys on realpath so a restart with a differently-spelled -d does
    not rescore already-scored images."""
    import glob
    import shutil

    from vit_ad_tpu.cli.score import main as score_main

    run, _ = run_dir
    src = tmp_path / "incoming"
    src.mkdir()
    pool = sorted(glob.glob(f"{category}/test/good/*"))
    for i, f in enumerate(pool[:2]):
        shutil.copy(f, src / f"frame_{i:03d}.png")

    out = tmp_path / "watch_out"
    rc = score_main([
        "-r", run, "-d", str(src), "-o", str(out),
        "--watch", "0.01", "--watch-waves", "1",
    ])
    assert rc == 0
    lines = (out / "scores.csv").read_text().splitlines()
    assert len(lines) == 3

    # simulate a hard kill mid-write: last row torn (no score cell)
    torn_path = str(src / "frame_001.png")
    (out / "scores.csv").write_text(
        "\n".join(lines[:2] + [torn_path]) + "\n"
    )
    # restart pointing at the SAME dir through a relative spelling
    rel = os.path.relpath(src)
    rc = score_main([
        "-r", run, "-d", rel, "-o", str(out),
        "--watch", "0.01", "--watch-waves", "1",
    ])
    assert rc == 0
    with open(out / "scores.csv") as f:
        rows = list(csv.reader(f))[1:]
    # frame_000 kept verbatim from the first run (not rescored), torn
    # frame_001 rescored exactly once
    paths = [os.path.basename(r[0]) for r in rows]
    assert sorted(paths) == ["frame_000.png", "frame_001.png"]
    assert rows[0] == lines[1].split(",")
    assert all(np.isfinite(float(r[1])) for r in rows)


def test_score_watch_mesh_composes(category, run_dir, tmp_path):
    """--watch x --mesh composition: continuous serving sharded over the
    virtual 8-device mesh scores a wave and matches the one-shot mesh
    scorer's values for the same images (same models, same normalization
    set)."""
    import glob
    import shutil

    from vit_ad_tpu.cli.score import main as score_main, score_folder

    run, _ = run_dir
    src = tmp_path / "incoming"
    src.mkdir()
    for i, f in enumerate(sorted(glob.glob(f"{category}/test/good/*"))[:4]):
        shutil.copy(f, src / f"frame_{i:03d}.png")

    out = tmp_path / "watch_mesh"
    rc = score_main([
        "-r", run, "-d", str(src), "-o", str(out),
        "--mesh", "4x2", "--watch", "0.01", "--watch-waves", "1",
    ])
    assert rc == 0
    with open(out / "scores.csv") as f:
        w_rows = list(csv.DictReader(f))
    assert len(w_rows) == 4

    one_shot = score_folder(run, str(src),
                            out_dir=str(tmp_path / "oneshot"), mesh="4x2")
    with open(tmp_path / "oneshot" / "scores.csv") as f:
        o_rows = list(csv.DictReader(f))
    assert [r["path"] for r in w_rows] == [r["path"] for r in o_rows]
    w = np.array([float(r["image_score"]) for r in w_rows])
    o = np.array([float(r["image_score"]) for r in o_rows])
    np.testing.assert_allclose(w, o, rtol=1e-6, atol=1e-7)
    assert one_shot["images"] == 4


def test_score_weights_dtype_bf16(category, run_dir, tmp_path):
    """--weights-dtype bf16 (the one-shot cold-path upload compression,
    r4 VERDICT item 3): scores must track the f32 path within bf16
    rounding, and ranking (what the anomaly decision consumes) must be
    preserved on this clearly-separated set. Default 'auto' must resolve
    f32 everywhere (bf16 is strictly opt-in — the r5 hardware A/B measured
    the bf16 one-shot wave slower AND drifting; cli.score
    _resolve_weights_dtype)."""
    from vit_ad_tpu.cli.score import _resolve_weights_dtype
    from vit_ad_tpu.cli.score import main as score_main

    assert _resolve_weights_dtype("auto") == "f32"  # always: bf16 opt-in
    assert _resolve_weights_dtype("bf16") == "bf16"

    run, _ = run_dir
    out32 = tmp_path / "s32"
    out16 = tmp_path / "s16"
    assert score_main(["-r", run, "-d", f"{category}/test",
                       "-o", str(out32)]) == 0
    assert score_main(["-r", run, "-d", f"{category}/test",
                       "-o", str(out16), "--weights-dtype", "bf16"]) == 0

    def read(p):
        with open(p / "scores.csv") as f:
            rows = list(csv.DictReader(f))
        return (np.array([float(r["image_score"]) for r in rows]),
                [r["path"] for r in rows])

    s32, p32 = read(out32)
    s16, p16 = read(out16)
    assert p32 == p16
    assert np.all(np.isfinite(s16))
    np.testing.assert_allclose(s16, s32, rtol=0.05, atol=0.02)
    # anomaly ranking preserved (defect scores > good scores either way)
    assert (np.argsort(s16) == np.argsort(s32)).all()
