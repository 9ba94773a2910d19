"""Engine cache: one resident compiled engine per distinct config
(reference: server/services/model_registry.py:12-41, which keys a dict by
the JSON of the config). Here the key is the config's stable hash and the
cached object carries compiled XLA executables, so a repeat config costs
zero compilation."""
from __future__ import annotations

import logging
import threading
from typing import Dict

from video_caption_tpu.config import InferenceConfig
from video_caption_tpu.engine import InferenceEngine
from video_caption_tpu.env import assert_core_runtime_ready

log = logging.getLogger(__name__)


class ModelRegistry:
    def __init__(self):
        self._engines: Dict[str, InferenceEngine] = {}
        self._lock = threading.Lock()

    def get_engine(self, config: InferenceConfig) -> InferenceEngine:
        key = config.cache_key()
        with self._lock:
            engine = self._engines.get(key)
            if engine is None:
                assert_core_runtime_ready()
                log.info("building engine for config %s", key)
                engine = InferenceEngine(config)
                self._engines[key] = engine
            return engine

    def __len__(self) -> int:
        return len(self._engines)

    def clear(self) -> None:
        """Drop every cached engine (benchmarks that rebuild with different
        env-derived settings, e.g. the sweep's cache-off leg — the video
        cache budget is read from the environment at engine build)."""
        with self._lock:
            self._engines.clear()


MODEL_REGISTRY = ModelRegistry()
