"""Legacy shim (reference: core/models/caption_model.py, itself a
compatibility wrapper)."""
from video_caption_tpu.models.caption_model import (  # noqa: F401
    CaptionModelConfig, init_caption_model, encode_video, map_prefix,
    video_to_prefix, compute_loss,
)
