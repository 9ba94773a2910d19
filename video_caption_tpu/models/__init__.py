"""Model zoo: ViT-B/16 frame encoder, GPT-2 prefix-conditioned decoder,
composite caption model, dual-encoder retrieval model, and tiny smoke models.

All models are *functional*: parameters are plain pytrees (nested dicts of
jnp arrays), forward passes are pure functions — the idiomatic JAX shape for
jit/scan/pjit, replacing the reference's nn.Module tree (src/models/)."""

from video_caption_tpu.models.vit import ViTConfig, init_vit_params, vit_encode  # noqa: F401
from video_caption_tpu.models.gpt2 import GPT2Config, init_gpt2_params  # noqa: F401
from video_caption_tpu.models.caption_model import (  # noqa: F401
    CaptionModelConfig,
    init_caption_model,
    encode_video,
)
