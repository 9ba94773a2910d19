"""Legacy shim (reference: server/schemas.py)."""
from video_caption_tpu.server.schemas import *  # noqa: F401,F403
from video_caption_tpu.server.schemas import InferRequest  # noqa: F401
