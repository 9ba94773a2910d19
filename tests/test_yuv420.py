"""YUV 4:2:0 wire path: raw-plane native decode + on-device chroma upsample
and YCbCr->RGB conversion must be BIT-EXACT with the PIL/libjpeg RGB path
(preprocessing/yuv420.py replicates jdsample.c h2v2_fancy_upsample and
jdcolor.c ycc_rgb fixed-point arithmetic), and unsupported inputs must fall
back to the RGB path per video."""
import numpy as np
import pytest
from PIL import Image

from video_caption_tpu.native.loader import (
    load_frames_native_yuv420, native_available,
)
from video_caption_tpu.preprocessing.frame_loader import (
    load_image_u8, load_video_array_u8, load_video_packed,
)
from video_caption_tpu.preprocessing.yuv420 import (
    packed_plane_len, yuv420_packed_to_rgb_chw_np,
)

needs_native = pytest.mark.skipif(not native_available(), reason="no g++/libjpeg")


def _images():
    rng = np.random.RandomState(7)
    grad = np.stack(np.meshgrid(np.arange(224), np.arange(224)), -1).sum(-1)
    return [
        rng.randint(0, 255, (224, 224, 3), np.uint8),                   # noise
        (grad[..., None] % 256).repeat(3, -1).astype(np.uint8),         # gradient
        (np.sin(np.arange(224 * 224 * 3).reshape(224, 224, 3) / 997.0)
         * 127 + 128).astype(np.uint8),                                 # structure
        np.full((224, 224, 3), 3, np.uint8),                            # near-black (clip low)
        np.full((224, 224, 3), 252, np.uint8),                          # near-white (clip high)
    ]


@pytest.fixture(scope="module")
def jpeg_420_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs420")
    i = 0
    for q in (75, 95):
        for img in _images():
            Image.fromarray(img).save(d / f"frame_{i:05d}.jpg", quality=q)
            i += 1
    return d


@needs_native
def test_yuv420_bit_exact_with_pil(jpeg_420_dir):
    paths = sorted(jpeg_420_dir.glob("frame_*.jpg"))
    packed = load_frames_native_yuv420(paths, 224)
    assert packed is not None
    assert packed.shape == (len(paths), packed_plane_len(224))
    rgb = yuv420_packed_to_rgb_chw_np(packed, 224)
    ref = np.stack([load_image_u8(p, 224) for p in paths])
    # identical bytes -> identical normalized pixels -> identical captions
    np.testing.assert_array_equal(rgb, ref)


@needs_native
def test_yuv420_rejects_non_420(tmp_path):
    rng = np.random.RandomState(0)
    p = tmp_path / "frame_00000.jpg"
    Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8)).save(
        p, quality=95, subsampling=0  # 4:4:4
    )
    assert load_frames_native_yuv420([p], 224) is None


@needs_native
def test_yuv420_rejects_wrong_size(tmp_path):
    rng = np.random.RandomState(0)
    p = tmp_path / "frame_00000.jpg"
    Image.fromarray(rng.randint(0, 255, (120, 160, 3), np.uint8)).save(p, quality=95)
    # not [224 x 224]: would need a host resize -> unsupported, RGB fallback
    assert load_frames_native_yuv420([p], 224) is None


@needs_native
def test_yuv420_decode_error(tmp_path):
    bad = tmp_path / "frame_00000.jpg"
    bad.write_bytes(b"not a jpeg")
    assert load_frames_native_yuv420([bad], 224) is None


@needs_native
def test_load_video_packed_formats(jpeg_420_dir, tmp_path):
    kind, arr = load_video_packed(jpeg_420_dir, num_frames=4, image_size=224)
    assert kind == "yuv420" and arr.shape == (4, packed_plane_len(224))
    # device-finish equals the RGB loader exactly
    rgb = yuv420_packed_to_rgb_chw_np(arr, 224)
    ref = load_video_array_u8(jpeg_420_dir, num_frames=4, image_size=224)[0]
    np.testing.assert_array_equal(rgb, ref)

    # non-224 frames -> whole-video RGB fallback
    d = tmp_path / "small"
    d.mkdir()
    rng = np.random.RandomState(1)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8)).save(
            d / f"frame_{i:05d}.jpg", quality=95
        )
    kind, arr = load_video_packed(d, num_frames=3, image_size=224)
    assert kind == "rgb" and arr.shape == (1, 3, 3, 224, 224)


@needs_native
def test_load_video_packed_pads_short_videos(jpeg_420_dir):
    kind, arr = load_video_packed(jpeg_420_dir, num_frames=16, image_size=224)
    assert kind == "yuv420" and arr.shape == (16, packed_plane_len(224))
    # tail repeats the last real frame (static shapes downstream)
    np.testing.assert_array_equal(arr[10], arr[9])


@needs_native
def test_engine_yuv_wire_caption_parity(tiny_params, tiny_cfg, jpeg_420_dir, tmp_path):
    """Captions through BOTH engine paths (single-stream chunked upload and
    the batched dispatch) must be identical with the YUV wire on and off —
    the device conversion is bit-exact, so every program sees equal pixels."""
    from dataclasses import replace

    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import InferenceEngine

    # tiny geometry but the REAL wire condition: 224x224 4:2:0 frames
    model_cfg = replace(tiny_cfg, vit=replace(tiny_cfg.vit, image_size=224))
    import jax

    params = __import__(
        "video_caption_tpu.models.caption_model", fromlist=["init_caption_model"]
    ).init_caption_model(jax.random.PRNGKey(0), model_cfg)

    def make(yuv: bool):
        cfg = default_inference_config(
            ckpt="missing.pt", num_frames=2, image_size=224,
            preset1="precise", preset2="precise", preset3="natural",
        )
        cfg = replace(cfg, compile=replace(cfg.compile, yuv420_wire=yuv))
        return InferenceEngine(cfg, params=params, model_cfg=model_cfg)

    eng_yuv, eng_rgb = make(True), make(False)
    # the sampled preset draws from the engine rng; use the same seed state
    dirs = [str(jpeg_420_dir)] * 2
    b_yuv = eng_yuv.infer_batch(dirs)
    b_rgb = eng_rgb.infer_batch(dirs)
    for a, b in zip(b_yuv, b_rgb):
        assert a.candidates == b.candidates and a.best_text == b.best_text
    s_yuv = eng_yuv.infer(str(jpeg_420_dir))
    s_rgb = eng_rgb.infer(str(jpeg_420_dir))
    assert s_yuv.candidates == s_rgb.candidates
