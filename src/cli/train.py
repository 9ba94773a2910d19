"""Legacy shim (reference: src/cli/train.py) — `python -m src.cli.train`
keeps working."""
from video_caption_tpu.cli.train import *  # noqa: F401,F403
from video_caption_tpu.cli.train import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
