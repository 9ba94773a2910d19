"""Legacy shim (reference: server/settings.py)."""
from video_caption_tpu.server.settings import *  # noqa: F401,F403
from video_caption_tpu.server.settings import SETTINGS, ServerSettings  # noqa: F401
