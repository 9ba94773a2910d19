"""Legacy shim (reference: experiments/hybrid_infer.py) — the hybrid
in-house + fallback-captioner flow lives in tools/hybrid_infer here."""
from video_caption_tpu.tools.hybrid_infer import *  # noqa: F401,F403
from video_caption_tpu.tools.hybrid_infer import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
