"""Legacy shim (reference: Ui/app_chainlit.py) — keeps the old command
``chainlit run Ui/app_chainlit.py -w`` usable."""
from video_caption_tpu.frontend.chainlit_app import *  # noqa: F401,F403
