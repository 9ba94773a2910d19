"""Legacy shim (reference: frontend/chainlit_app.py) — keeps
``chainlit run frontend/chainlit_app.py`` usable."""
from video_caption_tpu.frontend.chainlit_app import *  # noqa: F401,F403
