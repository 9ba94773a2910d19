"""Legacy shim (reference: core/engine.py) — ``core.engine.InferenceEngine``
keeps working."""
from video_caption_tpu.engine import InferenceEngine, load_params  # noqa: F401
