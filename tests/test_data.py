"""Data layer: directory contract, deterministic split, batching, masks."""

import numpy as np
import pytest

from vit_ad_tpu.data import files as F
from vit_ad_tpu.data.dataset import AnomalyDataset, infer_label, mask_path_for
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_btad_category, make_mvtec_category


@pytest.fixture(scope="module")
def mvtec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvtec")
    make_mvtec_category(str(root), "synthcat", img_size=32)
    return str(root)


@pytest.fixture(scope="module")
def btad_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("btad")
    make_btad_category(str(root), "01", img_size=32)
    return str(root)


def test_join_to_file_list_deterministic(mvtec_root):
    a = F.join_to_file_list(mvtec_root, "train/good")
    b = F.join_to_file_list(mvtec_root, "train/good")
    assert a == b and len(a) == 20
    # seed-24 shuffle must differ from sorted order (w.h.p. for 20 files)
    assert a != sorted(a)
    assert F.join_to_file_list(mvtec_root, "train/good", shuffle=False) == sorted(a)


def test_split_80_20(mvtec_root):
    train, valid = F.train_valid_split(mvtec_root, "train/good")
    assert len(train) == 16 and len(valid) == 4
    assert not set(train) & set(valid)
    # amount_data truncation (reference GeneralDataLoader.py:99-101)
    train2, valid2 = F.train_valid_split(mvtec_root, "train/good", amount_data=8)
    assert len(train2) == 8 and len(valid2) == 2


def test_label_and_mask_rules(mvtec_root, btad_root):
    good = f"{mvtec_root}/synthcat/test/good/000.png"
    bad = f"{mvtec_root}/synthcat/test/crack/000.png"
    assert infer_label(good) == 0 and infer_label(bad) == 1
    assert mask_path_for(good) is None
    assert mask_path_for(bad) == (
        f"{mvtec_root}/synthcat/ground_truth/crack/000_mask.png"
    )
    ko = f"{btad_root}/01/test/ko/000.bmp"
    assert infer_label(ko) == 1
    assert mask_path_for(ko) == f"{btad_root}/01/ground_truth/ko/000.png"
    ko3 = "/data/btad/03/test/ko/000.bmp"
    assert mask_path_for(ko3) == "/data/btad/03/ground_truth/ko/000.bmp"


def test_validation_dataset_items(mvtec_root):
    files = F.join_to_file_list(f"{mvtec_root}/synthcat", "test")
    ds = AnomalyDataset(files, img_size=32, validation=True)
    n_defect = 0
    for i in range(len(ds)):
        img, mask, label = ds[i]
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert mask.shape == (32, 32) and set(np.unique(mask)) <= {0, 1}
        if label == 1:
            n_defect += 1
            assert mask.sum() > 0
        else:
            assert mask.sum() == 0
    assert n_defect == 5 and len(ds) == 10


def test_pipeline_batching_and_padding(mvtec_root):
    pipe = DataPipeline(
        batch_size=6, base_path=mvtec_root, data_path="train/good", img_size=32
    )
    batches = list(pipe.train_batches())
    # 16 train files, bs 6 → 3 padded batches
    assert len(batches) == 3
    assert all(b.images.shape == (6, 32, 32, 3) for b in batches)
    assert batches[-1].valid.tolist() == [True] * 4 + [False] * 2
    assert int(sum(b.valid.sum() for b in batches)) == 16


def test_pipeline_mean_std(mvtec_root):
    pipe = DataPipeline(
        batch_size=8, base_path=mvtec_root, data_path="train/good", img_size=32
    )
    mean, std = pipe.compute_mean_std()
    # accumulate by hand
    ds = AnomalyDataset(pipe.train_files, 32)
    all_imgs = np.stack([ds[i] for i in range(len(ds))]).astype(np.float64) / 255.0
    np.testing.assert_allclose(mean, all_imgs.mean((0, 1, 2)), atol=1e-5)
    np.testing.assert_allclose(std, all_imgs.std((0, 1, 2)), atol=1e-5)


def test_test_batches_have_targets(mvtec_root):
    pipe = DataPipeline(
        batch_size=4,
        base_path=f"{mvtec_root}/synthcat",
        data_path="test",
        img_size=32,
        validation_mode=True,
    )
    total = 0
    for b in pipe.test_batches():
        assert b.masks is not None and b.labels is not None
        total += int(b.valid.sum())
    assert total == 10


def test_prefetch_surfaces_decode_errors(tmp_path):
    """A corrupt image must RAISE in the consuming loop, not silently end
    the prefetch iterator early (which would truncate an epoch or an eval
    set to the batches before the bad file)."""
    import numpy as np
    import pytest
    from PIL import Image

    from vit_ad_tpu.data.loader import DataPipeline

    good = tmp_path / "ok.png"
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(good)
    bad = tmp_path / "torn.png"
    bad.write_bytes(good.read_bytes()[:40])  # truncated mid-header

    pipe = DataPipeline(batch_size=2, img_size=16,
                        files=[str(good), str(bad)])
    with pytest.raises(Exception):
        for _ in pipe.test_batches(prefetch=2):
            pass
