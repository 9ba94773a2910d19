"""Fallback captioners (reference: tools/caption_fallback_blip.py,
caption_fallback_pt.py): BLIP or vit-gpt2 HF captioners applied to the
first/middle/last frame with pick-best voting.

These require pretrained HF weights (network or cache); in hermetic
environments ``make_blip_fallback`` raises at call time and hybrid_infer
keeps the in-house result — the same graceful degradation the reference
shows when BLIP fails (hybrid_infer.py:161-163).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, List

log = logging.getLogger(__name__)


def _sample_three(frames_dir: str) -> List[Path]:
    from video_caption_tpu.preprocessing.frame_loader import list_frames

    files = list_frames(frames_dir)
    if not files:
        raise FileNotFoundError(f"no frames under {frames_dir}")
    return [files[0], files[len(files) // 2], files[-1]]


def make_blip_fallback(model_name: str = "Salesforce/blip-image-captioning-base") -> Callable[[str], str]:
    """BLIP captioner over first/middle/last frame, best by ranker score
    (reference: caption_fallback_blip.py:60-96)."""
    state = {}

    def fallback(frames_dir: str) -> str:
        if "pipe" not in state:
            from transformers import BlipForConditionalGeneration, BlipProcessor

            state["processor"] = BlipProcessor.from_pretrained(model_name)
            state["model"] = BlipForConditionalGeneration.from_pretrained(model_name)
        from PIL import Image

        from video_caption_tpu.postprocessing.candidate_ranker import score_sentence

        captions = []
        for path in _sample_three(frames_dir):
            with Image.open(path) as img:
                inputs = state["processor"](img.convert("RGB"), return_tensors="pt")
            out = state["model"].generate(**inputs, max_new_tokens=30)
            captions.append(state["processor"].decode(out[0], skip_special_tokens=True))
        return max(captions, key=score_sentence)

    fallback.name = model_name
    return fallback
