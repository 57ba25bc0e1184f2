"""Native C++ tile decoder == PIL convert("RGB") (exact bytes).

Covers the formats DOTA/FAIR tiles appear in: RGB PNG, RGBA PNG,
grayscale PNG, palette PNG, 16-bit PNG, baseline JPEG (same libjpeg
as PIL, so bytes must match), plus the threaded batch API and its
failure reporting.
"""

import numpy as np
import pytest
from PIL import Image

from rs_detection_tpu.native import decoder


def _native_available():
    return decoder.get_lib() is not None


pytestmark = pytest.mark.skipif(
    not _native_available(),
    reason="native decoder unavailable (no toolchain/libpng)")


def _roundtrip(tmp_path, img: Image.Image, name: str, fmt: str):
    p = str(tmp_path / name)
    img.save(p, format=fmt)
    ref = np.asarray(Image.open(p).convert("RGB"), np.uint8)
    got = decoder.decode_image(p)
    np.testing.assert_array_equal(got, ref)


def test_rgb_png(tmp_path):
    rng = np.random.RandomState(0)
    arr = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
    _roundtrip(tmp_path, Image.fromarray(arr), "rgb.png", "PNG")


def test_rgba_png(tmp_path):
    rng = np.random.RandomState(1)
    arr = (rng.rand(21, 33, 4) * 255).astype(np.uint8)
    _roundtrip(tmp_path, Image.fromarray(arr, "RGBA"), "rgba.png",
               "PNG")


def test_gray_png(tmp_path):
    rng = np.random.RandomState(2)
    arr = (rng.rand(19, 27) * 255).astype(np.uint8)
    _roundtrip(tmp_path, Image.fromarray(arr, "L"), "gray.png", "PNG")


def test_palette_png(tmp_path):
    rng = np.random.RandomState(3)
    arr = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    img = Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE)
    _roundtrip(tmp_path, img, "pal.png", "PNG")


def test_16bit_png(tmp_path):
    rng = np.random.RandomState(4)
    arr16 = (rng.rand(12, 18) * 65535).astype(np.uint16)
    img = Image.fromarray(arr16)
    p = str(tmp_path / "g16.png")
    img.save(p, format="PNG")
    got = decoder.decode_image(p)
    # libpng strip_16 drops the low byte; PIL's convert path differs in
    # rounding, so compare against the high byte directly
    ref = np.repeat((arr16 >> 8).astype(np.uint8)[..., None], 3,
                    axis=2)
    np.testing.assert_array_equal(got, ref)


def test_jpeg(tmp_path):
    rng = np.random.RandomState(5)
    arr = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
    _roundtrip(tmp_path, Image.fromarray(arr), "t.jpg", "JPEG")


def test_batch(tmp_path):
    rng = np.random.RandomState(6)
    paths = []
    refs = []
    for i in range(6):
        arr = (rng.rand(32, 24, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"b{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        refs.append(arr)
    got = decoder.decode_batch(paths, w=24, h=32, nthreads=3)
    np.testing.assert_array_equal(got, np.stack(refs))


def test_batch_failure_reported(tmp_path):
    p_ok = str(tmp_path / "ok.png")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p_ok)
    with pytest.raises(IOError, match="failures"):
        decoder.decode_batch([p_ok, str(tmp_path / "missing.png")],
                             w=8, h=8)


def test_wrong_size_is_failure(tmp_path):
    p = str(tmp_path / "small.png")
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(p)
    with pytest.raises(IOError):
        decoder.decode_batch([p], w=8, h=8)
