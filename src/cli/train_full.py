"""Legacy shim (reference: src/cli/train_full.py) — `python -m src.cli.train_full`
keeps working."""
from video_caption_tpu.cli.train_full import *  # noqa: F401,F403
from video_caption_tpu.cli.train_full import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
