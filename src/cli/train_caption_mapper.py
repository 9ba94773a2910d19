"""Legacy shim (reference: src/cli/train_caption_mapper.py) — `python -m src.cli.train_caption_mapper`
keeps working."""
from video_caption_tpu.cli.train_caption_mapper import *  # noqa: F401,F403
from video_caption_tpu.cli.train_caption_mapper import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
