"""Legacy shim (reference: tools/caption_fallback_pt.py): the
safetensors-safe serving fallback API."""
from video_caption_tpu.tools.caption_fallback import (  # noqa: F401
    caption_from_frames_dir as caption_blip_from_frames_dir,
)
from video_caption_tpu.tools.caption_fallback import (  # noqa: F401
    make_vit_gpt2_fallback, select_best_pt, score_sentence_pt,
)
