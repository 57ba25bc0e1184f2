"""On-device bicubic resize == cv2.resize(INTER_CUBIC).

The reference tiler resizes scenes with cv2 INTER_CUBIC
(ImgSplit_multi_process.py:263-266); the device resize must match it,
not PIL/jax.image semantics (Keys a=-0.5).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rs_detection_tpu.data.device_resize import resize_cubic  # noqa: E402


@pytest.mark.parametrize("rate", [0.5, 1.5, 0.75, 2.0])
def test_matches_cv2_float(rate):
    rng = np.random.RandomState(0)
    img = rng.rand(97, 113, 3).astype(np.float32) * 255.0
    out_h = int(round(97 * rate))
    out_w = int(round(113 * rate))
    ref = cv2.resize(img, (out_w, out_h),
                     interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_cubic(img, out_h, out_w))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_uint8_scene_close_to_cv2():
    rng = np.random.RandomState(1)
    img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    ref = cv2.resize(img.astype(np.float32), (40, 32),
                     interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_cubic(img, 32, 40))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_identity():
    rng = np.random.RandomState(2)
    img = rng.rand(16, 24, 3).astype(np.float32)
    got = np.asarray(resize_cubic(img, 16, 24))
    np.testing.assert_array_equal(got, img)
