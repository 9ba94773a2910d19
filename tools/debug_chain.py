"""Legacy shim (reference: tools/debug_chain.py) — `python -m tools.debug_chain`
keeps working."""
from video_caption_tpu.tools.debug_chain import *  # noqa: F401,F403
from video_caption_tpu.tools.debug_chain import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
