"""Legacy shim (reference: experiments/inference.py) — keeps the old
standalone entry usable:

    python -m experiments.inference --frames_dir D --emit_json

and the programmatic ``run_one_video(frames_dir, ckpt, ...)`` API, returning
the same {"S1","S2","S3","BEST"} dict.
"""
from __future__ import annotations

import logging

from video_caption_tpu.cli.infer_once import main  # noqa: F401

log = logging.getLogger(__name__)

_IGNORED = ("stage", "vit_name", "gpt2_name", "emit_json")


def run_one_video(frames_dir: str, ckpt: str, stage: str = "all", **kwargs) -> dict:
    """Single-video three-preset inference + best-of selection
    (reference: experiments/inference.py:312-385). Extra kwargs that only
    made sense on the torch stack are accepted and ignored with a log."""
    import dataclasses

    from video_caption_tpu.config import InferenceConfig
    from video_caption_tpu.engine import InferenceEngine

    cfg_fields = {f.name for f in dataclasses.fields(InferenceConfig)}
    overrides = {k: v for k, v in kwargs.items() if k in cfg_fields}
    dropped = [k for k in kwargs if k not in cfg_fields and k not in _IGNORED]
    if dropped:
        log.info("run_one_video: ignoring legacy kwargs %s", dropped)
    config = dataclasses.replace(InferenceConfig(ckpt=ckpt), **overrides)
    result = InferenceEngine(config).infer(frames_dir).to_api_dict()
    if kwargs.get("emit_json"):
        import json

        print(json.dumps(result, ensure_ascii=False))
    return result


if __name__ == "__main__":
    raise SystemExit(main())
