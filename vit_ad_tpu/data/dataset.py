"""Per-item dataset honoring the MVTec/BTAD directory contract.

Label/mask rules match reference GeneralDataset.__getitem__
(reference src/data_loader/GeneralDataset.py:61-117):

  * dir endswith "good" or "ok"  → label 0, zero mask
  * dir endswith "ko" (BTAD)     → label 1, mask at /ground_truth/ with
    .bmp→.png rename except category "03"
  * anything else (MVTec defect) → label 1, mask `<stem>_mask.png` under
    /ground_truth/

Host work is decode + resize only (PIL bilinear, the same kernel torchvision
Resize applies to PIL inputs); scaling to [0,1] and normalization are fused
into the jit graph on device (data/loader.py), keeping the host off the
inference hot path.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


def infer_label(image_path: str) -> int:
    d = os.path.dirname(image_path)
    return 0 if (d.endswith("good") or d.endswith("ok")) else 1


def mask_path_for(image_path: str) -> Optional[str]:
    """Ground-truth mask path per the reference's path-rewrite rules, or None
    for good/ok samples."""
    d = os.path.dirname(image_path)
    if d.endswith("good") or d.endswith("ok"):
        return None
    if d.endswith("ko"):  # BTAD
        if f"{os.sep}03{os.sep}" in image_path:
            return image_path.replace(f"{os.sep}test{os.sep}", f"{os.sep}ground_truth{os.sep}")
        return image_path.replace(
            f"{os.sep}test{os.sep}", f"{os.sep}ground_truth{os.sep}"
        ).replace(".bmp", ".png")
    # MVTec
    return (
        image_path.replace(f"{os.sep}test{os.sep}", f"{os.sep}ground_truth{os.sep}")
        .replace(".png", "_mask.png")
        .replace(".bmp", ".png")
    )


class AnomalyDataset:
    """Index-addressable dataset yielding uint8 images (+ labels/masks in
    validation mode). Resizing happens at decode time on the host; all float
    math happens on device."""

    def __init__(
        self,
        file_names: List[str],
        img_size: int,
        validation: bool = False,
        only_labels: bool = False,
        missing_mask_ok: bool = False,
    ) -> None:
        self.file_names = file_names
        self.img_size = img_size
        self.validation = validation
        self.only_labels = only_labels
        # label-free folder scoring (DataPipeline(files=...)): images carry
        # no ground truth, so a missing mask means zeros. Labeled dataset
        # flows keep the loud FileNotFoundError — a broken MVTec/BTAD layout
        # must not silently zero the pixel metrics.
        self.missing_mask_ok = missing_mask_ok

    def __len__(self) -> int:
        return len(self.file_names)

    def _load_image(self, path: str) -> np.ndarray:
        # native C++ decode+resize (PIL-parity triangle filter) when built;
        # PIL fallback otherwise (set VITAD_NO_NATIVE=1 to force PIL)
        from vit_ad_tpu.data import native

        img = native.load_image(path, self.img_size)
        if img is not None:
            return img
        img = Image.open(path).convert("RGB")
        img = img.resize((self.img_size, self.img_size), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)  # [H, W, 3]

    def _load_mask(self, image_path: str) -> np.ndarray:
        mp = mask_path_for(image_path)
        if mp is None or (self.missing_mask_ok and not os.path.exists(mp)):
            return np.zeros((self.img_size, self.img_size), dtype=np.uint8)
        from vit_ad_tpu.data import native

        mask = native.load_mask(mp, self.img_size)
        if mask is not None:
            return mask
        mask = Image.open(mp)
        mask = mask.resize((self.img_size, self.img_size), Image.BILINEAR)
        mask = np.asarray(mask)
        if mask.ndim == 3:
            mask = mask[..., 0]
        return (mask != 0).astype(np.uint8)  # binarize (reference :102,:112)

    def __getitem__(self, index: int):
        path = self.file_names[index]
        if self.only_labels:
            return infer_label(path)
        image = self._load_image(path)
        if not self.validation:
            return image
        return image, self._load_mask(path), infer_label(path)

    def labels(self) -> np.ndarray:
        return np.asarray([infer_label(p) for p in self.file_names], dtype=np.int32)


def default_norm_stats() -> Tuple[np.ndarray, np.ndarray]:
    from vit_ad_tpu.config import IMAGENET_MEAN, IMAGENET_STD

    return np.asarray(IMAGENET_MEAN, np.float32), np.asarray(IMAGENET_STD, np.float32)
