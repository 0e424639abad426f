"""Native C++ image codec: semantics match the pure-Python path."""

import io

import numpy as np
import pytest

from spectral_tpu.render import image as image_mod

native = pytest.importorskip("spectral_tpu.runtime.native")

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def test_u8_conversion_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.uniform(-0.5, 1.5, size=(33, 47, 4)).astype(np.float32)
    data[0, 0, 0] = np.nan
    data[5, 5, 2] = np.inf
    data[7, 3, 1] = -np.inf
    got = native.convert_f32_rgba_to_u8(data)
    want = image_mod.accum_to_u8(data, native=False)
    # NaN maps to 0 deterministically in BOTH paths (the fallback
    # nan_to_nums before clipping; NaN->uint8 would be UB otherwise).
    assert got[0, 0, 0] == 0 and want[0, 0, 0] == 0
    assert got[5, 5, 2] == 255 and got[7, 3, 1] == 0
    assert np.array_equal(got, want)


def test_large_buffer_multithreaded_path():
    rng = np.random.default_rng(1)
    data = rng.uniform(0, 1, size=(512, 512, 4)).astype(np.float32)
    got = native.convert_f32_rgba_to_u8(data)
    want = image_mod.accum_to_u8(data, native=False)
    assert np.array_equal(got, want)


def test_png_round_trip():
    from PIL import Image

    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, size=(21, 37, 4), dtype=np.uint8)
    png_bytes = native.encode_png_rgba(u8)
    assert png_bytes[:8] == b"\x89PNG\r\n\x1a\n"
    decoded = np.asarray(Image.open(io.BytesIO(png_bytes)))
    assert np.array_equal(decoded, u8)


def test_save_image_native_path(tmp_path):
    from PIL import Image

    accum = np.zeros((8, 8, 4), np.float32)
    accum[..., 0] = 0.5
    accum[..., 3] = 1.0
    p = tmp_path / "x.png"
    image_mod.save_image(accum, p, native=True)
    decoded = np.asarray(Image.open(p))
    assert decoded[0, 0, 0] == 127 and decoded[0, 0, 3] == 255
