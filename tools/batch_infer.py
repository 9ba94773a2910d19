"""Legacy shim (reference: tools/batch_infer.py) — `python -m tools.batch_infer`
keeps working."""
from video_caption_tpu.tools.batch_infer import *  # noqa: F401,F403
from video_caption_tpu.tools.batch_infer import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
