"""Frontend layer against a live backend: REST client (urllib path),
error wrapping, health check, and the chainlit message handler."""
import numpy as np
import pytest
from PIL import Image

from video_caption_tpu.config import default_inference_config
from video_caption_tpu.engine import InferenceEngine


class TinyTok:
    eos_token_id = 127
    bos_token_id = 127
    pad_token_id = 127
    vocab_size = 128

    def encode(self, text):
        return [b % 127 for b in text.encode()] or [1]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(int(i)) for i in ids if int(i) != 127)


@pytest.fixture(scope="module")
def backend(tiny_cfg, tiny_params, tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            d / f"frame_{i:05d}.jpg"
        )

    cfg = default_inference_config(ckpt="missing.pt", num_frames=2, image_size=32)
    engine = InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)
    engine.tokenizer = TinyTok()

    from video_caption_tpu.server.services import model_registry
    from video_caption_tpu.server.stdlib_server import StdlibServer

    orig = model_registry.ModelRegistry.get_engine
    model_registry.ModelRegistry.get_engine = lambda self, config: engine
    srv = StdlibServer("127.0.0.1", 0).start()
    yield srv, str(d)
    model_registry.ModelRegistry.get_engine = orig
    srv.stop()


@pytest.fixture(autouse=True)
def _point_client_at_backend(backend, monkeypatch):
    srv, _ = backend
    from video_caption_tpu.frontend import api_client

    monkeypatch.setattr(api_client, "BACKEND_URL", f"http://127.0.0.1:{srv.port}")


def test_infer_caption_roundtrip(backend):
    from video_caption_tpu.frontend.api_client import infer_caption

    _, frames = backend
    payload = infer_caption(frames, num_frames=2, image_size=32)
    assert set(payload) == {"S1", "S2", "S3", "BEST"}


def test_backend_error_wrapping(backend):
    from video_caption_tpu.frontend.api_client import BackendError, infer_caption

    with pytest.raises(BackendError, match="400"):
        infer_caption("/no/such/dir")


def test_health_check(backend):
    from video_caption_tpu.frontend.api_client import check_health

    assert check_health() is True


def test_chainlit_handle_message(backend):
    from video_caption_tpu.frontend.chainlit_app import format_result, handle_message

    _, frames = backend
    reply = handle_message(frames)
    assert "**BEST" in reply and "- S1:" in reply
    assert "not a directory" in handle_message("/nope/nothere")
    assert "paste the path" in handle_message("").lower()
    # formatting is robust to sparse payloads
    assert "BEST (?)" in format_result({})


def test_serving_load_harness(backend, tmp_path, monkeypatch):
    """run_load drives real HTTP traffic through the batching queue."""
    _, frames = backend
    from video_caption_tpu.bench.serving_load import run_load

    result = run_load(frames, qps=20, duration_s=1.5, num_frames=2, max_batch=4)
    assert result["errors"] == 0
    assert result["requests_ok"] >= 10
    assert result["latency_ms"]["p50"] is not None
