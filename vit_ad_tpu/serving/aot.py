"""AOT serving artifacts: the compiled scoring graph as a deployable file.

The reference deploys by shipping torch ``.pth`` checkpoints that need the
whole Python model zoo at the serving site (reference validation_loop.py:
248-274 rebuilds the model classes per weight file). The TPU-native
deployment artifact is the *program* itself: ``jax.export`` traces the SAME
per-batch scoring graph the evaluators jit (``pipeline/eval.make_*_batch_fn``
— one code path, so bundle scores are bit-identical to the evaluators'),
bakes the run's params and normalization stats in as constants, and
serializes the StableHLO to disk. Reloading needs jax + numpy only — the
host score tail lives in the dependency-light ``vit_ad_tpu/scoring.py``, so
no flax module definitions, no registry, no orbax restore, no weight
conversion enter the serving site's import graph (locked by
tests/test_serving_export.py's no-flax subprocess check; ``score_files``
additionally pulls the data layer for image decoding) — and the artifact
can be lowered for platforms the exporting host doesn't have (serialize on
a CPU dev box, serve on TPU).

Artifact layout (one directory):

    manifest.json   kind / batch / img_size / platforms / provenance
    scorer.bin      serialized jax.export.Exported (uint8 [B,H,W,3] → payload)

Portability: by default the export traces with every Pallas kernel gate
forced OFF so the artifact is pure StableHLO (runs on any listed platform;
TPU custom-call kernels would pin it to the exact kernel serialization).
``portable=False`` keeps the kernels (export on a TPU host, serve on TPU).
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager
from typing import TYPE_CHECKING, Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from vit_ad_tpu.ops.pallas.gates import ALL_GATES

if TYPE_CHECKING:  # heavy (flax model zoo) — only needed by the EXPORT side
    from vit_ad_tpu.pipeline.loading import RunModels

MANIFEST_NAME = "manifest.json"
SCORER_NAME = "scorer.bin"
WEIGHTS_NAME = "weights.npz"

# EVERY Pallas gate forced off for portable exports: the kernels lower to
# TPU custom calls, which pin the artifact to one platform + kernel
# serialization version (and would fail jax.export's safety check). The XLA
# paths these gates fall back to are the same ones the CPU test suite
# certifies. Derived from the single gate registry (ops/pallas/gates.py) so
# a default-on gate can never drift out of this blocklist again — a user's
# env (VITAD_PALLAS_*=1) can't leak a kernel in either.
_PORTABLE_ENV = {gate: "0" for gate in ALL_GATES}


@contextmanager
def _trace_env(portable: bool):
    if not portable:
        yield
        return
    old = {k: os.environ.get(k) for k in _PORTABLE_ENV}
    os.environ.update(_PORTABLE_ENV)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def build_payload_fn_and_params(
    m: RunModels, mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
) -> Tuple[Any, Tuple[Any, ...]]:
    """`(fn, params)` where `fn(*params, images_u8)` is the per-kind batch
    payload graph (pipeline/eval.make_*_batch_fn — the evaluators' exact
    code path). Params stay explicit arguments so callers choose whether to
    bake them (constants in the export) or keep them external inputs."""
    from vit_ad_tpu.pipeline import eval as E

    mean_j = None if mean is None else jnp.asarray(mean)
    std_j = None if std is None else jnp.asarray(std)
    hp = m.hp
    if m.kind == "mdn":
        encoder, ep, mdn, mp = m.parts
        return E.make_mdn_batch_fn(encoder, mdn, hp, mean_j, std_j), (ep, mp)
    if m.kind == "nf":
        encoder, ep, flow, fp = m.parts
        return E.make_nf_batch_fn(encoder, flow, hp, mean_j, std_j), (ep, fp)
    if m.kind == "recon":
        model, variables = m.parts
        return E.make_recon_batch_fn(model, hp, mean_j, std_j), (variables,)
    if m.kind == "mdn_resnet":
        encoder, ev, mdns, heads = m.parts
        fn = E.make_mdn_resnet_batch_fn(encoder, mdns, hp, mean_j, std_j,
                                        m.stages)
        return fn, (ev, list(heads))
    if m.kind == "nf_resnet":
        encoder, ev, flows, heads = m.parts
        fn = E.make_nf_resnet_batch_fn(encoder, flows, hp, mean_j, std_j,
                                       m.stages)
        return fn, (ev, list(heads))
    raise ValueError(f"unknown RunModels kind {m.kind!r}")


def build_payload_fn(m: RunModels, mean: Optional[np.ndarray] = None,
                     std: Optional[np.ndarray] = None):
    """`images_u8 [B,H,W,3] → payload` with the run's params closed over
    (they become baked constants in the exported artifact). The payload is
    the per-kind device output of the matching evaluator
    (pipeline/eval.make_*_batch_fn); `vit_ad_tpu.scoring.payload_to_scores`
    turns concatenated payloads into (image_scores, pixel_scores)."""
    fn, params = build_payload_fn_and_params(m, mean, std)
    return lambda im: fn(*params, im)


def _scores_tail(kind: str, img_size: int, ref_max_ll):
    """In-graph payload→[B]-image-score tail for scores-only bundles, with
    `vit_ad_tpu.scoring.payload_to_scores`'s exact image-score semantics.
    MDN kinds need the baked reference normalizer (per-call-set
    normalization cannot be computed inside a fixed per-chunk graph)."""
    from vit_ad_tpu.ops.resize import interpolate_bilinear

    if kind in ("nf", "nf_resnet", "recon"):
        def tail(payload):
            maps = payload.astype(jnp.float32)
            return jnp.max(maps.reshape(maps.shape[0], -1), axis=1)

        return tail
    if ref_max_ll is None:
        raise ValueError(
            "payload='scores' for MDN kinds needs ref_images (the baked "
            "max-log-likelihood normalizer) — per-call-set normalization "
            "cannot live inside a fixed per-chunk graph"
        )
    if kind == "mdn":
        rm = float(ref_max_ll[0])

        def tail(ll):
            prob = jnp.exp(jnp.minimum(ll.astype(jnp.float32) - rm, 0.0))
            return (jnp.min(prob, axis=1) * -1.0) + 1.0

        return tail
    if kind == "mdn_resnet":
        rms = [float(r) for r in ref_max_ll]

        def tail(payload):
            anoms = []
            for p, rm in zip(payload, rms):
                prob = jnp.exp(jnp.minimum(p.astype(jnp.float32) - rm, 0.0))
                side = int(round(float(np.sqrt(prob.shape[1]))))
                up = interpolate_bilinear(
                    prob.reshape(-1, side, side), img_size, img_size,
                    align_corners=True,
                )
                anoms.append((up * -1.0) + 1.0)
            pix = jnp.mean(jnp.stack(anoms, -1), axis=-1)
            return jnp.max(pix.reshape(pix.shape[0], -1), axis=1)

        return tail
    raise ValueError(f"unknown score kind {kind!r}")


def export_bundle(
    m: RunModels,
    out_dir: str,
    batch: int = 32,
    platforms: Optional[Sequence[str]] = None,
    portable: bool = True,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    extra_meta: Optional[dict] = None,
    ref_images: Optional[np.ndarray] = None,
    weights: str = "baked",
    payload: str = "full",
) -> dict:
    """Export a run's scoring graph as a serving bundle directory.

    `platforms` lists lowering targets (e.g. ["cpu", "tpu"]); None = the
    exporting host's default platform. `portable=False` keeps Pallas TPU
    kernels in the graph (TPU-only artifact, needs the custom-call safety
    check disabled).

    `weights`: "baked" (default) folds the run's params into the program as
    constants — one self-contained scorer.bin. "external" exports the
    program with the params as INPUTS and writes them to `weights.npz`
    beside it: the serialized module stays a few MB regardless of model
    size, which matters for remotely-attached runtimes that ship the module
    through a size-limited compile RPC (a baked DeiT-base bundle exceeded
    the axon tunnel's remote-compile request limit with HTTP 413), and the
    npz is diffable/re-signable without retracing. Scores are identical
    either way (tests/test_serving_export.py).

    `ref_images` (uint8 [N,H,W,3], e.g. the run's training images): for MDN
    kinds, bakes their max log-likelihood into the manifest as the bundle's
    fixed probability normalizer, making scores comparable ACROSS serving
    calls (per-call-set normalization — the reference semantics and the
    default without it — gives the same image different absolute scores
    depending on what else arrived in the wave).

    `payload`: "full" (default) exports the evaluators' device payload
    (e.g. full-resolution anomaly maps — ~200 KB/img to fetch); "scores"
    folds the image-score tail INTO the graph and returns only [B] floats —
    ~100,000x less download per chunk, for deployments that threshold on
    image scores (a full-map flagship bundle measured 58.5 img/s over a
    45 MB/s link, bandwidth-bound on the payload fetch). MDN kinds require
    `ref_images` (the in-graph tail needs the baked normalizer).
    Returns the manifest dict."""
    if batch < 1:
        raise ValueError("batch must be >= 1")
    if weights not in ("baked", "external"):
        raise ValueError(f"weights must be 'baked' or 'external', got {weights!r}")
    if payload not in ("full", "scores"):
        raise ValueError(f"payload must be 'full' or 'scores', got {payload!r}")
    fn_p, params = build_payload_fn_and_params(m, mean, std)
    fn = lambda im: fn_p(*params, im)  # noqa: E731
    ref_max_ll = None
    if ref_images is not None and m.kind in ("mdn", "mdn_resnet"):
        from vit_ad_tpu.scoring import payload_ref_max_ll

        fn_j = jax.jit(fn)
        payloads = []
        for s in range(0, ref_images.shape[0], batch):
            chunk = np.asarray(ref_images[s:s + batch])
            if chunk.shape[0] < batch:  # pad the tail to the baked batch
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], batch - chunk.shape[0], 0)]
                )
            payloads.append(jax.tree.map(np.asarray, fn_j(jnp.asarray(chunk))))
        if isinstance(payloads[0], tuple):
            cat: Any = tuple(
                np.concatenate([p[i] for p in payloads], axis=0)
                for i in range(len(payloads[0]))
            )
        else:
            cat = np.concatenate(payloads, axis=0)
        ref_max_ll = payload_ref_max_ll(m.kind, cat)
    img = m.hp.img_size
    # DISTINCT function objects for the export (never mutate a closure a
    # jit has already traced: the ref-images block jits `fn` above, and
    # jax's trace caches key on function identity, not closure contents —
    # rebinding fn_p silently exported the unwrapped graph once)
    if payload == "scores":
        tail = _scores_tail(m.kind, img, ref_max_ll)
        base_fn_p = fn_p

        def export_fn_p(*args):
            return tail(base_fn_p(*args))
    else:
        export_fn_p = fn_p

    def export_fn(im):
        return export_fn_p(*params, im)

    spec = jax.ShapeDtypeStruct((batch, img, img, 3), jnp.uint8)
    kwargs: dict = {}
    if platforms:
        kwargs["platforms"] = [str(p) for p in platforms]
    if not portable:
        kwargs["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        ]
    flat_weights = None
    with _trace_env(portable):
        if weights == "external":
            flat, treedef = jax.tree_util.tree_flatten(params)

            def flat_fn(flat_params, im):
                p = jax.tree_util.tree_unflatten(treedef, flat_params)
                return export_fn_p(*p, im)

            wspecs = [jax.ShapeDtypeStruct(np.shape(x), x.dtype)
                      for x in flat]
            exp = jexport.export(jax.jit(flat_fn), **kwargs)(wspecs, spec)
            flat_weights = [np.asarray(x) for x in flat]
        else:
            exp = jexport.export(jax.jit(export_fn), **kwargs)(spec)
    blob = exp.serialize()

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "kind": m.kind,
        "batch": batch,
        "img_size": img,
        "platforms": list(exp.platforms),
        "portable": portable,
        "weights": weights,
        "payload": payload,
        "model_name": m.hp.model_name,
        "architecture": m.hp.architecture,
        "jax_version": jax.__version__,
        "calling_convention_version": exp.calling_convention_version,
    }
    if ref_max_ll is not None:
        manifest["ref_max_loglik"] = ref_max_ll
    if extra_meta:
        manifest.update(extra_meta)
    with open(os.path.join(out_dir, SCORER_NAME), "wb") as f:
        f.write(blob)
    if flat_weights is not None:
        np.savez(
            os.path.join(out_dir, WEIGHTS_NAME),
            **{f"w{i:05d}": w for i, w in enumerate(flat_weights)},
        )
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServingBundle:
    """A loaded serving artifact: pad → per-chunk `Exported.call` → host
    score tail. Needs only jax + numpy (and the data layer, if decoding
    image files through `score_files`)."""

    def __init__(self, bundle_dir: str):
        with open(os.path.join(bundle_dir, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        with open(os.path.join(bundle_dir, SCORER_NAME), "rb") as f:
            self._exp = jexport.deserialize(bytearray(f.read()))
        self.kind: str = self.manifest["kind"]
        self.batch: int = int(self.manifest["batch"])
        self.img_size: int = int(self.manifest["img_size"])
        self.payload_kind: str = self.manifest.get("payload", "full")
        self._weights = None
        if self.manifest.get("weights") == "external":
            npz = np.load(os.path.join(bundle_dir, WEIGHTS_NAME))
            host = [npz[k] for k in sorted(npz.files)]
            # one transfer at load; per-call args are then device-resident
            self._weights = [jnp.asarray(w) for w in host]

    def payloads(self, images_u8: np.ndarray):
        """Raw concatenated device payloads for [N,H,W,3] uint8 images
        (N >= 1 arbitrary; the tail chunk is padded with repeats and
        trimmed)."""
        n, h, w, c = images_u8.shape
        if n == 0:
            raise ValueError(
                "no images to score (got a [0,H,W,3] array — empty folder?)"
            )
        if (h, w, c) != (self.img_size, self.img_size, 3):
            raise ValueError(
                f"bundle expects [N,{self.img_size},{self.img_size},3] "
                f"uint8 images, got {images_u8.shape}"
            )
        b = self.batch
        pad = (-n) % b
        if pad:
            images_u8 = np.concatenate(
                [images_u8, np.repeat(images_u8[-1:], pad, axis=0)], axis=0
            )
        outs = []
        for s in range(0, n + pad, b):
            chunk = jnp.asarray(images_u8[s:s + b])
            if self._weights is not None:
                outs.append(self._exp.call(self._weights, chunk))
            else:
                outs.append(self._exp.call(chunk))
        host = [jax.tree.map(np.asarray, o) for o in outs]
        if isinstance(host[0], tuple):
            cat: Any = tuple(
                np.concatenate([o[i] for o in host], axis=0)[:n]
                for i in range(len(host[0]))
            )
        else:
            cat = np.concatenate(host, axis=0)[:n]
        return cat

    def score(self, images_u8: np.ndarray,
              normalizer: str = "auto") -> Tuple[np.ndarray, np.ndarray]:
        """[N,H,W,3] uint8 → (image_scores [N], pixel_scores [N,H,W]) with
        the matching evaluator's exact score semantics.

        `normalizer` (MDN kinds only): "auto" uses the export-time baked
        reference max log-likelihood when the manifest carries one
        (`export_bundle(ref_images=...)`) so scores are comparable and
        thresholdable across calls; "call" forces the reference's
        per-call-set normalization (bit-identical to the evaluators — the
        same image then scores differently depending on the rest of the
        wave, pipeline/eval module docstring).

        Scores-only bundles (`export_bundle(payload='scores')`) computed
        the image score in-graph; they return (image_scores, None) — there
        are no pixel maps to fetch, which is the point."""
        from vit_ad_tpu.scoring import payload_to_scores

        if self.payload_kind == "scores":
            return np.asarray(self.payloads(images_u8)), None
        ref = None
        if normalizer == "auto":
            ref = self.manifest.get("ref_max_loglik")
        elif normalizer != "call":
            raise ValueError(f"normalizer must be 'auto' or 'call', got {normalizer!r}")
        return payload_to_scores(self.kind, self.payloads(images_u8),
                                 self.img_size, ref_max_ll=ref)

    def score_files(self, paths: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Decode + resize image files through the data layer, then score."""
        from vit_ad_tpu.data.loader import DataPipeline

        pipe = DataPipeline(batch_size=self.batch, img_size=self.img_size,
                            files=list(paths))
        ims = np.concatenate(
            [b.images[: int(b.valid.sum())]
             for b in pipe.test_batches(prefetch=0, host=True)],
            axis=0,
        )
        return self.score(ims)


def load_bundle(bundle_dir: str) -> ServingBundle:
    return ServingBundle(bundle_dir)
