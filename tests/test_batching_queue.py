"""Request-coalescing queue: batching, ordering, error isolation, and the
concurrent-requests-through-the-server path."""
import threading

import numpy as np
import pytest
from PIL import Image

from video_caption_tpu.server.services.batching_queue import BatchingQueue


class RecordingEngine:
    """Engine stub recording batch sizes (dispatch/collect API)."""

    def __init__(self, fail_on=None):
        self.batches = []
        self.fail_on = fail_on or set()

    def infer_batch_dispatch(self, dirs):
        self.batches.append(len(dirs))
        return list(dirs)

    def infer_batch_collect(self, dirs):
        if any(d in self.fail_on for d in dirs):
            raise FileNotFoundError("boom")
        return [f"res:{d}" for d in dirs]

    def infer_batch(self, dirs):
        return self.infer_batch_collect(self.infer_batch_dispatch(dirs))

    def infer(self, d):
        if d in self.fail_on:
            raise FileNotFoundError(f"missing {d}")
        return f"res:{d}"


def test_coalesces_concurrent_requests():
    eng = RecordingEngine()
    q = BatchingQueue(eng, max_batch=8, max_wait_ms=100)
    futs = [q.submit(f"dir{i}") for i in range(6)]
    results = [f.result(timeout=10) for f in futs]
    assert results == [f"res:dir{i}" for i in range(6)]
    q.stop()
    # at least one multi-request batch formed
    assert max(eng.batches) > 1


def test_error_isolation_falls_back_per_request():
    eng = RecordingEngine(fail_on={"bad"})
    q = BatchingQueue(eng, max_batch=8, max_wait_ms=100)
    good = q.submit("good")
    bad = q.submit("bad")
    assert good.result(timeout=10) == "res:good"
    with pytest.raises(FileNotFoundError):
        bad.result(timeout=10)
    q.stop()


def test_real_engine_batched_serving(tiny_cfg, tiny_params, tmp_path):
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

    rng = np.random.RandomState(0)
    dirs = []
    for v in range(3):
        d = tmp_path / f"v{v}"
        d.mkdir()
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                d / f"frame_{i:05d}.jpg"
            )
        dirs.append(str(d))

    cfg = default_inference_config(ckpt="missing.pt", num_frames=2, image_size=32)
    engine = InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)
    engine.tokenizer = TinyTok()
    engine.warmup()  # compile before concurrency

    q = BatchingQueue(engine, max_batch=4, max_wait_ms=200)
    results = {}

    def call(d):
        results[d] = q.infer(d)

    threads = [threading.Thread(target=call, args=(d,)) for d in dirs]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    q.stop()
    assert len(results) == 3
    for d in dirs:
        assert set(results[d].to_api_dict()) == {"S1", "S2", "S3", "BEST"}
