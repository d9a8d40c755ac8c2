"""Optimizers with reference (torch) semantics."""

from __future__ import annotations

import optax


def torch_adam(learning_rate: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam parity: weight decay is L2 *coupled* — added to the
    gradient before the Adam moments (unlike optax.adamw's decoupled decay).
    The reference uses this for every head (e.g. reference
    src/pipeline/LearnerRecon.py:415, LearnerMDN.py:130, LearnerNF.py:119)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.extend(
        [
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate),
        ]
    )
    return optax.chain(*parts)
