"""Serving-path tests via the stdlib HTTP server (runs with zero extra
deps): same routes/status mapping as the FastAPI app."""
import json
import urllib.error
import urllib.request

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
        return [b % 127 for b in text.encode()]

    def decode(self, ids, skip_special_tokens=True):
        return bytes(int(i) % 127 + 32 for i in ids if int(i) != 127).decode("ascii", "replace")


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(d / f"frame_{i:05d}.jpg")
    return str(d)


@pytest.fixture(scope="module")
def server(tiny_cfg, tiny_params, frames_dir):
    cfg = default_inference_config(ckpt="missing.pt", num_frames=3, image_size=32)
    engine = InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)
    engine.tokenizer = TinyTok()

    from video_caption_tpu.server.services import model_registry
    from video_caption_tpu.server.stdlib_server import StdlibServer

    model_registry.MODEL_REGISTRY._engines["pinned"] = engine
    orig = model_registry.ModelRegistry.get_engine
    model_registry.ModelRegistry.get_engine = lambda self, config: engine
    srv = StdlibServer("127.0.0.1", 0).start()
    yield srv
    model_registry.ModelRegistry.get_engine = orig
    srv.stop()


def _post(server, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_health(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/health") as resp:
        assert json.loads(resp.read()) == {"status": "ok"}
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/api/v1/health") as resp:
        assert json.loads(resp.read()) == {"status": "ok"}


def test_infer_both_mounts(server, frames_dir):
    for path in ("/infer", "/api/v1/infer"):
        status, body = _post(server, path, {"frames_dir": frames_dir})
        assert status == 200, body
        assert set(body) == {"S1", "S2", "S3", "BEST"}
        assert set(body["BEST"]) == {"key", "text"}


def test_infer_missing_dir_is_400(server):
    status, body = _post(server, "/infer", {"frames_dir": "/no/such/dir"})
    assert status == 400
    assert "frames_dir" in body["detail"]


def test_infer_bad_payload_is_422(server):
    status, _ = _post(server, "/infer", {"wrong_field": 1})
    assert status == 422


def test_unknown_route_404(server):
    status, _ = _post(server, "/nope", {})
    assert status == 404


def test_cuda_era_fields_accepted(server, frames_dir):
    status, body = _post(server, "/infer", {
        "frames_dir": frames_dir,
        "device": "cuda", "vit_enable_torch_compile": True,
        "use_cupy_prefix_projector": False,
    })
    assert status == 200, body


def test_schemas_import_and_validate():
    """Pydantic schema definitions are valid even without fastapi installed."""
    from video_caption_tpu.server.schemas import HealthResponse, InferRequest, InferResponse

    req = InferRequest(frames_dir="/x")
    assert req.prefix_len == 4 and req.num_frames == 8
    assert req.preset3 == "natural"
    # CUDA-era fields default to None (accepted-and-ignored contract)
    assert req.device is None and req.vit_enable_torch_compile is None
    resp = InferResponse(S1="a", S2="b", S3="c", BEST={"key": "S1", "text": "a"})
    assert resp.BEST["key"] == "S1"
    assert HealthResponse(status="ok").status == "ok"


def test_fastapi_app_assembles():
    """Route mounting and handler wiring (runs only where fastapi exists)."""
    pytest.importorskip("fastapi")
    from video_caption_tpu.server.app import create_app

    app = create_app()
    paths = {r.path for r in app.routes}
    assert {"/infer", "/api/v1/infer", "/health", "/api/v1/health"} <= paths


def test_warmup_config_matches_request_path_engine():
    """serve.py --warmup must warm the SAME engine the request path builds:
    the registry keys engines by the full config hash, so a preset mismatch
    (core vs serving defaults) would leave the serving engine cold and pay
    the full XLA compile inside the first request."""
    from video_caption_tpu.config import serving_inference_config
    from video_caption_tpu.server.schemas import InferRequest
    from video_caption_tpu.server.services.inference_service import request_to_config

    warm_cfg = serving_inference_config()  # what cli/serve.py --warmup builds
    req_cfg = request_to_config(InferRequest(frames_dir="/tmp/x"))
    assert warm_cfg.cache_key() == req_cfg.cache_key(), (
        "warmup and request-path configs hash to different engines"
    )
