"""Root-level drivers: trainings_loop sweep main and the multichip dryrun."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")


def test_trainings_loop_main(tmp_path, monkeypatch):
    from vit_ad_tpu.data.synthetic import make_mvtec_category

    root = tmp_path / "data"
    for cat in ("bottle", "cable"):
        make_mvtec_category(str(root), cat, img_size=32, n_train=10)

    import trainings_loop

    monkeypatch.chdir(tmp_path)
    # tiny model via trainer wrapper; sizes via the new override flags
    import vit_ad_tpu.pipeline.train as T

    orig = T.train_mdn

    def fast_mdn(hp, data, test, **kw):
        from vit_ad_tpu.config import DtypePolicy
        from vit_ad_tpu.models.vit import ViTEncoder

        hp.dtypes = DtypePolicy.f32()
        enc = ViTEncoder(img_size=32, patch_size=8, embed_dim=16, depth=1,
                         num_heads=2, num_prefix_tokens=2, dtypes=hp.dtypes)
        return orig(hp, data, test, encoder=enc, **kw)

    monkeypatch.setattr(T, "train_mdn", fast_mdn)
    trainings_loop.main(
        ["-a", "mdn", "-d", str(root), "-o", "out", "-c", "bottle,cable",
         "-e", "2", "-p", "2", "-n", "2", "-i", "32", "-b", "8"]
    )
    import csv

    rows = list(csv.DictReader(open(tmp_path / "out" / "results.csv")))
    assert {r["dataclass"] for r in rows} == {"bottle", "cable"}
    assert all("image_auroc_score" in r and r["image_auroc_score"] for r in rows)


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally
