"""Legacy shim (reference: core/config.py)."""
from video_caption_tpu.config import *  # noqa: F401,F403
from video_caption_tpu.config import (  # noqa: F401
    InferenceConfig, MemoryConfig, CompileConfig, MeshConfig,
    default_inference_config, serving_inference_config,
)
