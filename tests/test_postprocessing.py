"""Golden-case parity with the reference text cleaner / ranker.

``golden_clean_text.json`` holds (raw, expected) pairs produced by running
the reference implementation (core/postprocessing/text_cleaner.py) over a
case battery covering every pipeline branch.
"""
import json
from pathlib import Path

import pytest

from video_caption_tpu.postprocessing.candidate_ranker import score_sentence, select_best
from video_caption_tpu.postprocessing.text_cleaner import clean_text

GOLDEN = json.loads((Path(__file__).parent / "golden_clean_text.json").read_text())


@pytest.mark.parametrize("raw,expected", GOLDEN, ids=range(len(GOLDEN)))
def test_clean_text_golden(raw, expected):
    assert clean_text(raw) == expected


def test_score_prefers_mid_length_progressive():
    good = "A man is riding a horse happily across the wide green field."
    short = "A man."
    spam = "Click here to subscribe to the channel for more daily videos now."
    assert score_sentence(good) > score_sentence(short)
    assert score_sentence(good) > score_sentence(spam)


def test_score_empty_is_worst():
    assert score_sentence("") == -1e9


def test_select_best_returns_key_text_score():
    key, text, score = select_best(
        [("S1", "A man is riding a horse across the field today."),
         ("S2", "Short."),
         ("S3", "")]
    )
    assert key == "S1"
    assert "horse" in text
    assert isinstance(score, float)


def test_fallback_sentence_penalized():
    assert score_sentence("Someone is in the scene.") < score_sentence(
        "Someone is dancing in the scene."
    )
