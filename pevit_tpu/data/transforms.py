"""Host-side image preprocessing: PIL-bicubic resize + center crop.

The reference pipeline (feature.py:534-549) is
Resize(224, bicubic) -> CenterCrop(224) -> ToTensor -> Normalize(CLIP stats).
PIL bicubic differs subtly from jax.image bicubic (SURVEY.md §7.3 item 6), so
decode/resize/crop run on host with PIL exactly like torchvision; the
normalize step is fused on device (trainer.model_forward), keeping host
output uint8 (4x smaller HBM/transfer footprint than fp32).
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_center_crop(img, size: int = 224, *, use_native: bool = True) -> np.ndarray:
    """torchvision Resize(size)+CenterCrop(size) semantics; returns uint8 HWC.

    Fast path: the C++ PIL-compatible resampler (pevit_tpu/native); PIL
    fallback otherwise.
    """
    if use_native and isinstance(img, np.ndarray) and img.ndim == 3 and img.shape[2] == 3:
        try:
            from ..native import native_resize_center_crop

            return native_resize_center_crop(img, size)
        except Exception:
            pass
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB")
    w, h = img.size
    # torchvision Resize(int): scale the SHORTER side to `size`; the long
    # side TRUNCATES (torchvision functional.resize int() semantics)
    if w <= h:
        new_w, new_h = size, max(size, int(h * size / w))
    else:
        new_w, new_h = max(size, int(w * size / h)), size
    img = img.resize((new_w, new_h), Image.BICUBIC)
    # center crop
    left = int(round((new_w - size) / 2.0))
    top = int(round((new_h - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, dtype=np.uint8)


def resize_exact(img, size: int = 224) -> np.ndarray:
    """torchvision Resize((size, size), bicubic) — aspect-destroying exact
    resize, no crop: the reference's ``DATASET.CENTER_CROP False`` branch
    (feature.py:543-549).  Returns uint8 HWC."""
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB")
    return np.asarray(img.resize((size, size), Image.BICUBIC), dtype=np.uint8)


def preprocess_batch(images, size: int = 224, *, center_crop: bool = True) -> np.ndarray:
    """List of PIL/ndarray images -> (N, size, size, 3) uint8."""
    fn = resize_center_crop if center_crop else resize_exact
    return np.stack([fn(im, size) for im in images])
