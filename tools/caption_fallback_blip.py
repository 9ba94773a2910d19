"""Legacy shim (reference: tools/caption_fallback_blip.py): the batch
human-eval vote-mode captioner."""
from video_caption_tpu.tools.caption_fallback import (  # noqa: F401
    main, run_batch, pick_best, find_video_dirs, make_blip_fallback,
)

if __name__ == "__main__":
    raise SystemExit(main())
