"""The single registry of Pallas kernel env-var gates.

Every `VITAD_PALLAS_*` gate in the package must be listed here:
`serving/aot.py` derives the portable-export environment (all gates forced
OFF so exports stay pure StableHLO) from this tuple, and
`tests/test_serving_export.py` greps the source tree and fails if a new
gate is introduced without registering it — the round-3 advisor found
exactly that drift (VITAD_PALLAS_VIT_ATTN, default-on for TPU targets, was
missing from the portable-export blocklist, so a portable ViT export traced
a tpu_custom_call on TPU hosts and failed jax.export's safety check).

No imports on purpose: this module must stay loadable everywhere.
"""

ALL_GATES = (
    "VITAD_PALLAS_VIT_ATTN",     # models/vit.py — fused ViT/DeiT attention
    "VITAD_PALLAS_WINDOW_ATTN",  # models/swin.py — (shifted-)window attention
    "VITAD_PALLAS_GMM",          # ops/pallas/gmm.py — GMM scoring kernel
    "VITAD_PALLAS_GMM_TRAIN",    # ops/pallas/gmm_train.py — custom-VJP train
    "VITAD_PALLAS_MLP",          # ops/pallas/mlp.py — opt-in (loses today)
    "VITAD_PALLAS_LN",           # ops/pallas/layer_norm.py — opt-in (loses)
)
