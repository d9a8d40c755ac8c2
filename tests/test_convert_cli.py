"""Weight-conversion CLI: torch .pth → orbax → forward parity round-trip."""

import numpy as np
import torch

from tests.test_torch_convert import TorchViT
from vit_ad_tpu.cli.convert_weights import convert, load_encoder_params


def test_convert_cli_roundtrip(tmp_path, rng, monkeypatch):
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.config import DtypePolicy
    from vit_ad_tpu.models.vit import ViTEncoder

    # a small deit-structured torch checkpoint (full-size would be slow on CPU)
    torch.manual_seed(9)
    tm = TorchViT(img=32, patch=8, dim=32, depth=2, heads=4, prefix=2).eval()
    src = tmp_path / "deit.pth"
    torch.save(tm.state_dict(), src)

    # monkeypatch the CLI's encoder factory to the small config
    import vit_ad_tpu.cli.convert_weights as cw
    import vit_ad_tpu.models.vit as vit_mod

    small = lambda img: ViTEncoder(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        num_prefix_tokens=2, dtypes=DtypePolicy.f32(),
    )
    monkeypatch.setattr(vit_mod, "deit_base_distilled_patch16", small)
    import vit_ad_tpu.utils.torch_convert as tc

    orig_convert_vit = tc.convert_vit
    monkeypatch.setattr(
        tc, "convert_vit",
        lambda sd, depth=12, num_prefix_tokens=2: orig_convert_vit(
            sd, depth=2, num_prefix_tokens=2
        ),
    )

    path = convert("deit", str(src), str(tmp_path / "out"), img_size=32)

    enc = small(32)
    variables = load_encoder_params(path, enc, img_size=32)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(enc.apply(variables, jnp.asarray(x)).patch_embedding)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()[:, 2:, :]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convert_cli_esvit_student_checkpoint(tmp_path, rng, monkeypatch):
    """Real EsViT checkpoint shape: {'student': OrderedDict with module.
    prefix, 'teacher': ..., 'epoch': int} (reference
    TransformerEncoder.py:242-256)."""
    import jax
    import jax.numpy as jnp

    from tests.test_swin import TSwin
    from tests.test_swin_convert import _rename_to_esvit_layout
    from vit_ad_tpu.config import DtypePolicy
    from vit_ad_tpu.models.swin import EsViTEncoder, SwinTransformer

    torch.manual_seed(3)
    tm = TSwin(img=16, patch=2, dim=8, depths=(2, 2), heads=(2, 4), ws=4).eval()
    renamed = _rename_to_esvit_layout(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, depths=(2, 2)
    )  # keys already carry the module. prefix
    student = {k: torch.from_numpy(np.asarray(v)) for k, v in renamed.items()}
    src = tmp_path / "checkpoint_best.pth"
    torch.save({"student": student, "teacher": student, "epoch": 3}, src)

    import vit_ad_tpu.cli.convert_weights as cw
    import vit_ad_tpu.models.swin as swin_mod
    import vit_ad_tpu.utils.torch_convert as tc

    class TinyEsvit(EsViTEncoder):
        def setup(self):
            self.esvit = SwinTransformer(
                img_size=16, patch_size=2, embed_dim=8, depths=(2, 2),
                num_heads=(2, 4), window=4, dtypes=DtypePolicy.f32(),
            )

    monkeypatch.setattr(swin_mod, "esvit_swin_tiny", lambda img: TinyEsvit(img_size=16))
    orig = tc.convert_swin
    monkeypatch.setattr(
        tc, "convert_swin",
        lambda sd, img_size=224: orig(sd, img_size=16, patch_size=2,
                                      depths=(2, 2), window=4),
    )
    path = cw.convert("esvit", str(src), str(tmp_path / "out"), img_size=16)

    enc = TinyEsvit(img_size=16)
    variables = cw.load_encoder_params(path, enc, img_size=16)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(enc.apply(variables, jnp.asarray(x)).latent)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))[0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
