"""Native (C++/libjpeg) preprocessing vs the PIL reference path."""
import io

import numpy as np
import pytest
from PIL import Image

from lwdetr_tpu.data import native
from lwdetr_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native preproc lib unavailable")


def make_jpeg(w=123, h=87, seed=0, quality=95):
    rng = np.random.default_rng(seed)
    # smooth image so JPEG decode differences stay small
    x = rng.standard_normal((h // 8 + 1, w // 8 + 1, 3))
    x = np.kron(x, np.ones((8, 8, 1)))[:h, :w]
    arr = ((x - x.min()) / (np.ptp(x) + 1e-9) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_decode_jpeg_matches_pil():
    data = make_jpeg()
    ours = native.decode_jpeg(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours is not None
    assert ours.shape == ref.shape
    # both use libjpeg; allow tiny IDCT variation
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.0


def test_decode_resize_normalize_matches_python_path():
    data = make_jpeg(w=200, h=150, seed=1)
    size = 64
    out = native.decode_resize_normalize(data, size)
    assert out is not None
    arr, h, w = out
    assert (h, w) == (150, 200)
    assert arr.shape == (size, size, 3)

    img = Image.open(io.BytesIO(data))
    ref, _ = T.val_transform_square(img, None, size)
    # PIL uses fixed-point taps; allow a few gray levels of difference
    diff = np.abs(arr - ref) * np.array(T.IMAGENET_STD) * 255
    assert np.percentile(diff, 99) < 3.0, f"p99 diff {np.percentile(diff, 99)}"
    assert np.mean(diff) < 1.0, f"mean diff {np.mean(diff)}"


def test_resize_identity():
    data = make_jpeg(w=64, h=64, seed=2)
    out = native.decode_resize_normalize(data, 64)
    arr, h, w = out
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.float32) / 255
    ref = (ref - T.IMAGENET_MEAN) / T.IMAGENET_STD
    np.testing.assert_allclose(arr, ref, atol=2e-2)
