"""Cross-framework dress rehearsal (round-2 VERDICT item 6).

Full-pipeline equivalence, not just unit goldens: torch heads are TRAINED
with the reference's loss math on a fixed synthetic category, saved in the
reference's .pth format, re-evaluated through our validate_pth pipeline
(convert → rebuild → score → metrics), and the resulting AUROCs must agree
with a completely independent torch/numpy evaluator implementing the
reference Validator loop (reference src/pipeline/ValidatorMDN.py:104-185,
ValidatorNF.py:107-150) over the same encoder features — including an
independent Mann-Whitney AUROC, so not even our metrics engine is shared.
This is the closest in-env proxy for the §6 CSV quality-parity check
(no MVTec data / pretrained weights on this machine)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import test_legacy_pth as tlp
from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category
from vit_ad_tpu.models.vit import ViTEncoder

F32 = DtypePolicy.f32()
D = 32           # tiny encoder embedding size
IMG = 32         # image size → 4x4 = 16 patches at patch 8


def _mannwhitney_auroc(labels, scores) -> float:
    """Independent AUROC: tie-averaged rank (Mann-Whitney U) formulation —
    shares no code with vit_ad_tpu.pipeline.metrics."""
    labels = np.asarray(labels).ravel() > 0
    scores = np.asarray(scores, np.float64).ravel()
    order = np.argsort(scores, kind="mergesort")
    s = scores[order]
    ranks = np.empty(len(s), np.float64)
    i, r = 0, 1
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        ranks[i : j + 1] = 0.5 * (r + r + (j - i))
        r += j - i + 1
        i = j + 1
    unsorted = np.empty_like(ranks)
    unsorted[order] = ranks
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    return float(
        (unsorted[labels].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    )


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
    """Synthetic category + shared encoder features: train feats for torch
    head training, test feats/labels/masks for the torch-side evaluator.
    The encoder init/preprocessing replicate exactly what validate_pth
    rebuilds internally (same seed-24 init, ImageNet stats)."""
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.pipeline.features import make_feature_extractor
    from vit_ad_tpu.pipeline.train import default_encoder_params

    root = tmp_path_factory.mktemp("xfw")
    make_mvtec_category(str(root), "widget", img_size=IMG, n_train=16,
                        n_test_good=5, n_test_defect=5)

    encoder = ViTEncoder(img_size=IMG, patch_size=8, embed_dim=D, depth=2,
                         num_heads=4, num_prefix_tokens=2, dtypes=F32)
    hp = HyperParams(img_size=IMG, dtypes=F32)  # seed 24 = validate_pth's
    enc_params = default_encoder_params(encoder, hp)
    mean, std = default_norm_stats()
    extract = make_feature_extractor(encoder, enc_params, 0, mean, std)

    train = DataPipeline(batch_size=64, base_path=f"{root}/widget",
                         data_path="train/good", img_size=IMG)
    test = DataPipeline(batch_size=64, base_path=f"{root}/widget",
                        data_path="test", img_size=IMG, validation_mode=True)

    def collect(pipe, batches):
        feats, labels, masks = [], [], []
        for batch in batches:
            n = int(batch.valid.sum())
            feats.append(np.asarray(extract(batch.images))[:n])
            if batch.labels is not None:
                labels.append(np.asarray(batch.labels[:n]))
                masks.append(np.asarray(batch.masks[:n]))
        return (
            np.concatenate(feats),
            np.concatenate(labels) if labels else None,
            np.concatenate(masks) if masks else None,
        )

    train_feats, _, _ = collect(train, train.train_batches())
    test_feats, test_labels, test_masks = collect(test, test.test_batches())
    return {
        "root": str(root), "encoder": encoder,
        "train_feats": train_feats, "test_feats": test_feats,
        "labels": test_labels, "masks": test_masks,
    }


def _patched_registry(encoder):
    import vit_ad_tpu.registry as R

    class Ctx:
        def __enter__(self):
            self.orig = R.get_model
            R.get_model = lambda name, img_size, dtypes: encoder
            return self

        def __exit__(self, *a):
            R.get_model = self.orig

    return Ctx()


def test_mdn_pth_roundtrip_matches_torch_evaluator(rehearsal, tmp_path):
    """Torch-trained GMM (reference loss math incl. gumbel-softmax mixture
    weights, reference MixtureDensityNetwork.py:49-102) → reference-format
    .pth → validate_pth ≡ independent torch evaluator."""
    K = 4
    torch.manual_seed(7)
    tm = tlp.TorchGMDN(D, K)
    x = torch.from_numpy(rehearsal["train_feats"])
    opt = torch.optim.Adam(tm.parameters(), lr=1e-2)
    for _ in range(40):
        opt.zero_grad()
        pi, sigma, mu = tm(x)
        log_pi = torch.log(
            tF.gumbel_softmax(pi, tau=1.0, dim=-1) + 1e-15
        )
        dens = (
            -torch.log(sigma)
            - 0.5 * np.log(2 * np.pi)
            - 0.5 * ((x.unsqueeze(-1) - mu) / sigma) ** 2
        )
        ll = torch.logsumexp(log_pi.unsqueeze(2) + dens, dim=-1)
        loss = -ll.mean()
        loss.backward()
        opt.step()
    tm.eval()

    pth = tmp_path / f"{K}_gaussians_rehearsal_widget.pth"
    torch.save(tm.state_dict(), pth)

    # our full pipeline: .pth → strict convert → encoder+head rebuild →
    # Validator scoring → metrics engine
    import validation_loop as vl

    with _patched_registry(rehearsal["encoder"]):
        ours = vl.validate_pth(str(pth), "enc_deit", "mdn",
                               rehearsal["root"], img_size=IMG, dtypes=F32)

    # independent torch evaluator: reference ValidatorMdn.valid_loop_
    # transformer semantics (per-patch mean log-likelihood → probability →
    # min → invert; bilinear align_corners=True pixel map) on the same feats
    with torch.no_grad():
        xt = torch.from_numpy(rehearsal["test_feats"])
        pi, sigma, mu = tm(xt)
        log_pi = torch.log(torch.softmax(pi, dim=-1) + 1e-15)
        dens = (
            -torch.log(sigma)
            - 0.5 * np.log(2 * np.pi)
            - 0.5 * ((xt.unsqueeze(-1) - mu) / sigma) ** 2
        )
        ll = torch.logsumexp(log_pi.unsqueeze(2) + dens, dim=-1).mean(-1)
        prob = torch.exp(ll - ll.max())           # [N, P]
        image_scores = 1.0 - prob.min(dim=1).values
        side = int(np.sqrt(prob.shape[1]))
        up = tF.interpolate(
            prob.reshape(-1, 1, side, side), size=(IMG, IMG),
            mode="bilinear", align_corners=True,
        )[:, 0]
        pixel_scores = 1.0 - up

    img_auroc = _mannwhitney_auroc(rehearsal["labels"], image_scores.numpy())
    pix_auroc = _mannwhitney_auroc(rehearsal["masks"], pixel_scores.numpy())

    assert abs(ours["image_auroc_score"] - img_auroc) < 1e-3, (
        ours["image_auroc_score"], img_auroc)
    assert abs(ours["pixel_auroc_score"] - pix_auroc) < 1e-3, (
        ours["pixel_auroc_score"], pix_auroc)
    # non-degenerate scores (parity of two constants would be vacuous); the
    # absolute AUROC is low by construction — a depth-2 random encoder is a
    # weak feature extractor, which is fine: agreement is what's under test
    assert np.std(image_scores.numpy()) > 0
    assert np.std(pixel_scores.numpy()) > 0


def test_nf_pth_roundtrip_matches_torch_evaluator(rehearsal, tmp_path):
    """Torch-trained FrEIA-style flow (reference NLL: mean(0.5·Σz² − logdet),
    reference LearnerNF.py:129-151) → reference-format .pth → validate_pth ≡
    independent torch evaluator (ValidatorNF semantics)."""
    steps, hidden = 2, 16  # hidden_ratio = 16 / (D - D//2) = 1.0
    torch.manual_seed(13)
    tm = tlp.TorchRefNF(D, hidden, steps)
    side = int(np.sqrt(rehearsal["train_feats"].shape[1]))
    x = torch.from_numpy(
        rehearsal["train_feats"].reshape(-1, side, side, D)
    ).permute(0, 3, 1, 2)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    for _ in range(40):
        opt.zero_grad()
        z, logdet = tm(x)
        loss = torch.mean(0.5 * (z ** 2).sum(dim=(1, 2, 3)) - logdet)
        loss.backward()
        opt.step()
    tm.eval()

    pth = tmp_path / "nf-rehearsal_widget.pth"
    torch.save(tm.state_dict(), pth)

    import validation_loop as vl

    with _patched_registry(rehearsal["encoder"]):
        ours = vl.validate_pth(str(pth), "enc_deit", "nf", rehearsal["root"],
                               img_size=IMG, hidden_ratio=1.0,
                               flow_steps=steps, dtypes=F32)

    with torch.no_grad():
        xt = torch.from_numpy(
            rehearsal["test_feats"].reshape(-1, side, side, D)
        ).permute(0, 3, 1, 2)
        z, _ = tm(xt)
        log_lik = -0.5 * (z ** 2).mean(dim=1)      # [N, h, w]
        anomaly = 1.0 - torch.exp(log_lik)
        up = tF.interpolate(
            anomaly.unsqueeze(1), size=(IMG, IMG), mode="bilinear",
            align_corners=False,
        )[:, 0]
        image_scores = up.reshape(up.shape[0], -1).max(dim=1).values

    img_auroc = _mannwhitney_auroc(rehearsal["labels"], image_scores.numpy())
    pix_auroc = _mannwhitney_auroc(rehearsal["masks"], up.numpy())

    assert abs(ours["image_auroc_score"] - img_auroc) < 1e-3, (
        ours["image_auroc_score"], img_auroc)
    assert abs(ours["pixel_auroc_score"] - pix_auroc) < 1e-3, (
        ours["pixel_auroc_score"], pix_auroc)


def _make_torch_ae():
    """Reference AutoEncoderDeit replica at the rehearsal's tiny geometry:
    timm model (with its frozen classifier heads) at `encoder.deit`
    (reference TransformerEncoder.py:134), small decoder over the cls-token
    latent."""
    from test_decoder_convert import TorchSmallDecoder
    from test_torch_convert import TorchViT
    from torch import nn as tnn

    class TorchDeitWithHeads(TorchViT):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.head = tnn.Linear(kw["dim"], 1000)
            self.head_dist = tnn.Linear(kw["dim"], 1000)

    class TorchAE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = tnn.Module()
            self.encoder.deit = TorchDeitWithHeads(
                img=IMG, patch=8, dim=D, depth=2, heads=4, prefix=2
            )
            self.decoder = TorchSmallDecoder(z_space=D, s=1)

        def forward(self, x):
            toks = self.encoder.deit(x)
            return self.decoder(toks[:, 0])  # cls-token latent

    return TorchAE()


def _collect_test_images(test):
    images, labels, masks = [], [], []
    for batch in test.test_batches():
        n = int(batch.valid.sum())
        images.append(np.asarray(batch.images)[:n])
        labels.append(np.asarray(batch.labels[:n]))
        masks.append(np.asarray(batch.masks[:n]))
    return (np.concatenate(images), np.concatenate(labels),
            np.concatenate(masks))


def _torch_recon_scores(tm, images, mean, std):
    """Independent reference-ValidatorRecon evaluator: normalized input,
    channel-mean squared-error map, image score = amax
    (reference ValidatorRecon.py:92-136)."""
    with torch.no_grad():
        x = torch.from_numpy(images.astype(np.float32) / 255.0)
        x = (x - torch.tensor(mean)) / torch.tensor(std)
        x = x.permute(0, 3, 1, 2)
        recon = tm(x)
        err = ((recon - x) ** 2).mean(dim=1)      # [N, H, W] channel-mean
        image_scores = err.reshape(err.shape[0], -1).max(dim=1).values
    return image_scores.numpy(), err.numpy(), x


def test_recon_ae_export_matches_torch_evaluator(rehearsal, tmp_path):
    """The EXPORT direction of the dress rehearsal: an AE trained by OUR
    train_recon exports to the reference AutoEncoderDeit .pth layout, a
    torch replica strict-loads it, and an independent torch evaluator
    implementing the reference ValidatorRecon loop (channel-mean squared
    error map, image score = amax; reference ValidatorRecon.py:92-136)
    reproduces our evaluate_recon metrics — so a reference user can
    re-evaluate our trained AEs with their own tooling."""
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.models.autoencoder import TransformerAutoEncoder
    from vit_ad_tpu.pipeline.train import train_recon
    from vit_ad_tpu.utils.torch_convert import export_transformer_ae

    model = TransformerAutoEncoder(
        encoder=rehearsal["encoder"], decoder_kind="cnn", img_size=IMG,
        dtypes=F32,
    )
    hp = HyperParams(
        architecture="reconstruction", epochs=3, patience=3,
        learning_rate=1e-3, weight_decay=1e-4, batch_size=8, img_size=IMG,
        dtypes=F32,
    )
    data = DataPipeline(batch_size=8, base_path=f"{rehearsal['root']}/widget",
                        data_path="train/good", img_size=IMG)
    test = DataPipeline(batch_size=8, base_path=f"{rehearsal['root']}/widget",
                        data_path="test", img_size=IMG, validation_mode=True)
    res = train_recon(hp, data, test, model=model)
    ours = res.metrics

    sd = export_transformer_ae(res.head_params)

    tm = _make_torch_ae()
    tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    tm.eval()

    # independent evaluator over the raw test images, reference
    # preprocessing (/255, ImageNet normalize, NCHW)
    mean, std = default_norm_stats()
    images, labels, masks = _collect_test_images(test)
    image_scores, err, _ = _torch_recon_scores(tm, images, mean, std)

    img_auroc = _mannwhitney_auroc(labels, image_scores)
    pix_auroc = _mannwhitney_auroc(masks, err)

    assert abs(ours["image_auroc_score"] - img_auroc) < 1e-3, (
        ours["image_auroc_score"], img_auroc)
    assert abs(ours["pixel_auroc_score"] - pix_auroc) < 1e-3, (
        ours["pixel_auroc_score"], pix_auroc)
    assert np.std(image_scores) > 0


def test_recon_ae_pth_roundtrip_matches_torch_evaluator(rehearsal, tmp_path):
    """The IMPORT direction for recon — the reference→us migration scenario
    the other two heads already cover: an AE TRAINED IN TORCH with the
    reference's loss loop (Adam over the decoder, frozen timm encoder, MSE
    on normalized images; reference LearnerRecon.py:390-448), saved as a
    reference-layout .pth (the WHOLE AutoEncoder state dict incl. the
    encoder, reference TrainingsHelper.py:112-122), re-evaluated through
    validate_pth (convert_recon_ae → full-AE rebuild → evaluate_recon) ≡ an
    independent torch evaluator running the reference ValidatorRecon loop
    on the same torch model. Completes the {mdn, nf, recon} × {import,
    export} rehearsal matrix."""
    from vit_ad_tpu.data.dataset import default_norm_stats
    from vit_ad_tpu.models.autoencoder import TransformerAutoEncoder

    torch.manual_seed(21)
    tm = _make_torch_ae()
    for p in tm.encoder.deit.parameters():  # frozen pretrained encoder
        p.requires_grad = False
    mean, std = default_norm_stats()

    train = DataPipeline(batch_size=64,
                         base_path=f"{rehearsal['root']}/widget",
                         data_path="train/good", img_size=IMG)
    imgs = np.concatenate([
        np.asarray(b.images)[: int(b.valid.sum())]
        for b in train.train_batches()
    ])
    x = torch.from_numpy(imgs.astype(np.float32) / 255.0)
    x = ((x - torch.tensor(mean)) / torch.tensor(std)).permute(0, 3, 1, 2)

    opt = torch.optim.Adam(
        [p for p in tm.parameters() if p.requires_grad], lr=1e-3
    )
    tm.train()
    for _ in range(30):
        opt.zero_grad()
        loss = ((tm(x) - x) ** 2).mean()
        loss.backward()
        opt.step()
    tm.eval()

    pth = tmp_path / "recon-rehearsal_widget.pth"
    torch.save(tm.state_dict(), pth)

    import validation_loop as vl

    ae = TransformerAutoEncoder(encoder=rehearsal["encoder"],
                                decoder_kind="cnn", img_size=IMG, dtypes=F32)
    with _patched_registry(ae):
        ours = vl.validate_pth(str(pth), "ae_deit", "recon",
                               rehearsal["root"], img_size=IMG, dtypes=F32)

    test = DataPipeline(batch_size=64, base_path=f"{rehearsal['root']}/widget",
                        data_path="test", img_size=IMG, validation_mode=True)
    images, labels, masks = _collect_test_images(test)
    image_scores, err, _ = _torch_recon_scores(tm, images, mean, std)

    img_auroc = _mannwhitney_auroc(labels, image_scores)
    pix_auroc = _mannwhitney_auroc(masks, err)

    assert abs(ours["image_auroc_score"] - img_auroc) < 1e-3, (
        ours["image_auroc_score"], img_auroc)
    assert abs(ours["pixel_auroc_score"] - pix_auroc) < 1e-3, (
        ours["pixel_auroc_score"], pix_auroc)
    assert np.std(image_scores) > 0
