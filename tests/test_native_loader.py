"""Native C++ frame loader: build, parity vs the PIL reference path, and
fallback contract."""
import numpy as np
import pytest
from PIL import Image

from video_caption_tpu.native.loader import load_frames_native, native_available
from video_caption_tpu.preprocessing.frame_loader import load_image, load_video_array


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    for i in range(6):
        h, w = (120, 160) if i % 2 else (240, 320)
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            d / f"frame_{i:05d}.jpg", quality=95
        )
    return d


@pytest.mark.skipif(not native_available(), reason="no g++/libjpeg")
def test_native_matches_pil(jpeg_dir):
    paths = sorted(jpeg_dir.glob("frame_*.jpg"))
    native = load_frames_native(paths, 224)
    assert native is not None and native.shape == (6, 3, 224, 224)
    pil = np.stack([load_image(p, 224) for p in paths])
    # JPEG decode is bit-identical (both use libjpeg); the resize reproduces
    # PIL's fixed-point Resample.c pipeline, so outputs are BIT-EXACT
    np.testing.assert_array_equal(native, pil)


@pytest.mark.skipif(not native_available(), reason="no g++/libjpeg")
def test_native_fails_gracefully_on_bad_file(tmp_path):
    bad = tmp_path / "frame_00001.jpg"
    bad.write_bytes(b"not a jpeg")
    assert load_frames_native([bad], 32) is None


def test_load_video_array_native_toggle(jpeg_dir):
    a = load_video_array(jpeg_dir, num_frames=4, image_size=64, use_native=True)
    b = load_video_array(jpeg_dir, num_frames=4, image_size=64, use_native=False)
    assert a.shape == b.shape == (1, 4, 3, 64, 64)
    np.testing.assert_array_equal(a, b)  # native path is PIL-bit-exact


def test_u8_path_matches_fp32_after_device_normalize(jpeg_dir):
    """uint8 loader + on-device normalization must match the fp32 host path."""
    import jax.numpy as jnp

    from video_caption_tpu.models.vit import normalize_pixels
    from video_caption_tpu.preprocessing.frame_loader import load_video_array_u8

    u8 = load_video_array_u8(jpeg_dir, num_frames=4, image_size=64)
    assert u8.dtype == np.uint8 and u8.shape == (1, 4, 3, 64, 64)
    normalized = np.asarray(normalize_pixels(jnp.asarray(u8)))
    fp32 = load_video_array(jpeg_dir, num_frames=4, image_size=64)
    # u8 quantization costs at most half a pixel step / std
    assert np.abs(normalized - fp32).max() < (0.5 / 255) / 0.2 + 0.05
    assert np.mean(np.abs(normalized - fp32)) < 0.02


@pytest.mark.skipif(not native_available(), reason="no g++/libjpeg")
def test_native_u8_bit_exact_vs_pil_u8(jpeg_dir):
    from video_caption_tpu.native.loader import load_frames_native_u8
    from video_caption_tpu.preprocessing.frame_loader import load_image_u8

    paths = sorted(jpeg_dir.glob("frame_*.jpg"))
    native = load_frames_native_u8(paths, 224)
    assert native is not None
    pil = np.stack([load_image_u8(p, 224) for p in paths])
    np.testing.assert_array_equal(native, pil)


@pytest.mark.skipif(not native_available(), reason="no g++/libjpeg")
def test_native_bit_exact_on_upscale(tmp_path):
    """Upscale path (support=1, no antialias widening) must also be exact."""
    from video_caption_tpu.native.loader import load_frames_native_u8
    from video_caption_tpu.preprocessing.frame_loader import load_image_u8

    rng = np.random.RandomState(3)
    p = tmp_path / "frame_00000.jpg"
    Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(p, quality=95)
    native = load_frames_native_u8([p], 224)
    pil = load_image_u8(p, 224)
    np.testing.assert_array_equal(native[0], pil)
