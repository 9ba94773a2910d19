"""Server settings (reference: server/settings.py:9-14)."""
from __future__ import annotations

from dataclasses import dataclass

from video_caption_tpu.config import InferenceConfig, default_inference_config  # noqa: F401


@dataclass(frozen=True)
class ServerSettings:
    host: str = "127.0.0.1"
    port: int = 8001
    api_prefix: str = "/api/v1"
    allow_origins: tuple = ("*",)


SETTINGS = ServerSettings()
