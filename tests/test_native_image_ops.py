"""Native C++ resampler vs PIL bicubic parity + speed sanity."""

import numpy as np
import pytest
from PIL import Image

from pevit_tpu.native import get_lib, native_resize_center_crop

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


def _pil_resize_center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    """torchvision-semantics reference: truncated long side, half-even crop."""
    img = Image.fromarray(arr)
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(size, int(h * size / w))
    else:
        new_w, new_h = max(size, int(w * size / h)), size
    img = img.resize((new_w, new_h), Image.BICUBIC)
    left = int(round((new_w - size) / 2.0))
    top = int(round((new_h - size) / 2.0))
    return np.asarray(img.crop((left, top, left + size, top + size)))


@pytest.mark.parametrize("shape", [(100, 80, 3), (64, 64, 3), (300, 500, 3), (37, 220, 3)])
def test_native_matches_pil_bicubic(shape):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    want = _pil_resize_center_crop(arr, 32).astype(np.int32)
    got = native_resize_center_crop(arr, 32).astype(np.int32)
    diff = np.abs(got - want)
    # PIL uses fixed-point coefficients; float implementation matches to ~1 LSB
    assert diff.mean() < 0.5, diff.mean()
    assert np.percentile(diff, 99) <= 1
    assert diff.max() <= 3


def test_native_upscale_and_identity():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = native_resize_center_crop(arr, 32)
    assert out.shape == (32, 32, 3)
    # same-size path stays near-identity
    same = native_resize_center_crop(arr, 16)
    assert np.abs(same.astype(int) - arr.astype(int)).max() <= 1
