"""Legacy shim (reference: core/inference.py)."""
from video_caption_tpu.decode.presets import preset_to_kwargs, preset_names  # noqa: F401
