"""Legacy shim (reference: src/cli/train_decoder_only.py) — `python -m src.cli.train_decoder_only`
keeps working."""
from video_caption_tpu.cli.train_decoder_only import *  # noqa: F401,F403
from video_caption_tpu.cli.train_decoder_only import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
