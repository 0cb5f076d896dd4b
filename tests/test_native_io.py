"""Native PNG encoder tests: build via g++, roundtrip through PIL decode."""
import io

import numpy as np
import pytest

from splice_tpu import native
from splice_tpu.utils import io as io_utils


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativePng:
    def test_roundtrip_random(self, lib):
        from PIL import Image
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        data = native.encode_png_rgb8(arr)
        assert data is not None and data[:4] == b"\x89PNG"
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(back, arr)

    def test_roundtrip_smooth_gradient(self, lib):
        """Smooth images exercise the sub/up filter paths."""
        from PIL import Image
        y = np.linspace(0, 255, 64)[:, None]
        x = np.linspace(0, 255, 48)[None, :]
        arr = np.stack([y + 0 * x, 0 * y + x, (y + x) / 2],
                       axis=-1).astype(np.uint8)
        data = native.encode_png_rgb8(arr)
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(back, arr)

    def test_compression_beats_raw(self, lib):
        arr = np.zeros((128, 128, 3), np.uint8)
        data = native.encode_png_rgb8(arr)
        assert len(data) < 128 * 128 * 3 / 10

    def test_non_rgb8_declined_not_crashed(self, lib):
        """Grayscale/RGBA inputs return None (caller falls back to PIL)
        instead of raising."""
        assert native.encode_png_rgb8(np.zeros((8, 8), np.uint8)) is None
        assert native.encode_png_rgb8(np.zeros((8, 8, 4), np.uint8)) is None

    def test_save_image_grayscale_falls_back_to_pil(self, tmp_path):
        from PIL import Image
        arr = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
        p = io_utils.save_image(arr, str(tmp_path / "g.png"))
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(
            back, (np.clip(arr, 0, 1) * 255).astype(np.uint8))

    def test_save_image_uses_native_or_pil(self, tmp_path):
        from PIL import Image
        arr = np.random.default_rng(1).random((20, 30, 3)).astype(np.float32)
        p = io_utils.save_image(arr, str(tmp_path / "x.png"))
        back = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(
            back, (np.clip(arr, 0, 1) * 255).astype(np.uint8))

    def test_async_saver(self, tmp_path):
        from PIL import Image
        saver = io_utils.AsyncImageSaver()
        arr = np.full((8, 8, 3), 0.5, np.float32)
        saver.save(arr, str(tmp_path / "a.png"))
        saver.flush()
        assert (tmp_path / "a.png").exists()
        back = np.asarray(Image.open(tmp_path / "a.png"))
        assert back.shape == (8, 8, 3)
        saver.close()


def test_save_result_reference_path_contract(tmp_path):
    """save_result writes <dataroot>/out/<filename> from a float [0,1]
    image (reference util/util.py:55-59 contract) and round-trips the
    quantized pixels."""
    from PIL import Image

    rng = np.random.default_rng(3)
    img = rng.random((6, 5, 3)).astype(np.float32)
    path = io_utils.save_result(img, str(tmp_path / "pairroot"))
    assert path.endswith("out/output.png")
    back = np.asarray(Image.open(path))
    assert back.shape == (6, 5, 3)
    # truncating quantization, like the reference's tensor2im
    # (util/util.py:42-52 casts after *255 without rounding)
    np.testing.assert_array_equal(
        back, (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8))
