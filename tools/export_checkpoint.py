"""Legacy-style shim: export CLI is new in this framework (no reference
counterpart) but follows the tools/ layout."""
from video_caption_tpu.tools.export_checkpoint import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
