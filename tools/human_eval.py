"""Legacy shim (reference: tools/human_eval.py) — `python -m tools.human_eval`
keeps working."""
from video_caption_tpu.tools.human_eval import *  # noqa: F401,F403
from video_caption_tpu.tools.human_eval import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
