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
