"""Request/response schemas, field-compatible with the reference
(server/schemas.py:12-52) so existing clients keep working.

CUDA-era fields (``device``, ``vit_enable_*``, ``*cupy*``) are accepted and
ignored-with-log: on TPU those fusion toggles are XLA's job. Their TPU
analogs are the ``use_pallas_*`` switches and the bf16 policy, exposed as
new optional fields.
"""
from __future__ import annotations

from typing import Dict, Optional

from pydantic import BaseModel, Field

from video_caption_tpu.config import default_inference_config

_DEFAULT = default_inference_config()


class InferRequest(BaseModel):
    frames_dir: str = Field(..., description="Directory containing frame_*.jpg")
    ckpt: str = Field(default=_DEFAULT.ckpt, description="Checkpoint path (torch .pt or orbax dir)")
    stage: str = Field(default=_DEFAULT.stage, description="Reserved for compatibility")
    vit_name: str = Field(default=_DEFAULT.vit_name)
    gpt2_name: str = Field(default=_DEFAULT.gpt2_name)
    prefix_len: int = Field(default=_DEFAULT.prefix_len)
    num_frames: int = Field(default=_DEFAULT.num_frames)
    image_size: int = Field(default=_DEFAULT.image_size)
    ln_scale: float = Field(default=_DEFAULT.ln_scale)
    in_weight: float = Field(default=_DEFAULT.in_weight)
    preset1: str = Field(default=_DEFAULT.preset1)
    preset2: str = Field(default=_DEFAULT.preset2)
    preset3: str = Field(default=_DEFAULT.preset3)
    prompt1: str = Field(default=_DEFAULT.prompt1)
    prompt2: str = Field(default=_DEFAULT.prompt2)
    prompt3: str = Field(default=_DEFAULT.prompt3)
    backend: str = Field(default=_DEFAULT.backend)
    # TPU-native knobs
    compute_dtype: str = Field(default=_DEFAULT.compile.dtype, description="bfloat16|float32")
    use_pallas_fused_pool: bool = Field(default=_DEFAULT.compile.use_pallas_fused_pool)
    use_pallas_prefix_projector: bool = Field(default=_DEFAULT.compile.use_pallas_prefix_projector)
    # accepted-and-ignored CUDA-era compatibility fields
    device: Optional[str] = Field(default=None, description="Ignored on TPU")
    vit_enable_fp16: Optional[bool] = None
    vit_enable_attention_fastpath: Optional[bool] = None
    vit_prefer_channels_last: Optional[bool] = None
    vit_enable_torch_compile: Optional[bool] = None
    vit_torch_compile_mode: Optional[str] = None
    vit_enable_mlp_bias_gelu_fusion: Optional[bool] = None
    vit_enable_residual_layernorm_fusion: Optional[bool] = None
    vit_enable_cupy_fused_pool: Optional[bool] = None
    vit_cupy_pool_force_fp16: Optional[bool] = None
    use_cupy_prefix_projector: Optional[bool] = None
    cupy_prefix_force_fp16: Optional[bool] = None


class InferResponse(BaseModel):
    S1: str
    S2: str
    S3: str
    BEST: Dict[str, str]


class HealthResponse(BaseModel):
    status: str
