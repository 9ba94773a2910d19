"""Legacy shim (reference: src/models/caption_model.py). The torch
``VideoCaptionModel`` maps to the functional JAX model + config here."""
from video_caption_tpu.models.caption_model import (  # noqa: F401
    CaptionModelConfig, init_caption_model, encode_video, map_prefix,
    video_to_prefix, compute_loss,
)
