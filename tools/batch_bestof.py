"""Legacy shim (reference: tools/batch_bestof.py) — `python -m tools.batch_bestof`
keeps working."""
from video_caption_tpu.tools.batch_bestof import *  # noqa: F401,F403
from video_caption_tpu.tools.batch_bestof import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
