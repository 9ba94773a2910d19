"""Legacy shim (reference: frontend/api_client.py)."""
from video_caption_tpu.frontend.api_client import *  # noqa: F401,F403
