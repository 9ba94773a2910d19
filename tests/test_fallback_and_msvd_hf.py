"""Round-2 long-tail parity: BLIP vote mode + pt-variant selection
(reference: tools/caption_fallback_blip.py:44-58, caption_fallback_pt.py:
80-112) and the HF-datasets MSVD preparation path
(reference: scripts/prepare_msvd.py:30-212)."""
import json

import numpy as np
import pytest
from PIL import Image

from video_caption_tpu.scripts import prepare_msvd as pm
from video_caption_tpu.tools import caption_fallback as cf


# ---------------------------------------------------------------------------
# fallback selection logic
# ---------------------------------------------------------------------------

def test_pick_best_prefers_complete_sentences():
    cands = ["a dog", "a dog runs through the green field.", "a dog runs"]
    assert cf.pick_best(cands) == "a dog runs through the green field."


def test_pick_best_dedups_and_falls_back_to_longest():
    cands = ["cat", "cat", "a cat sits"]
    assert cf.pick_best(cands) == "a cat sits."  # period appended by cleaner


def test_pick_best_empty():
    assert cf.pick_best(["", None]) == ""


def test_select_best_pt_drops_web_junk_and_uses_canned_fallback():
    assert cf.select_best_pt(["visit https://spam.example now"]) == "Someone is in the scene."


def test_select_best_pt_scores_with_mu10():
    # 10-word sentence with -ing verb beats a 4-word one
    good = "a man is playing a guitar on the big stage"
    weak = "a man stands here"
    assert cf.select_best_pt([weak, good]).lower().startswith("a man is playing")


def test_clean_caption_pt_dedups_and_capitalizes():
    assert cf.clean_caption_pt("the the dog dog runs") == "The dog runs."


def test_run_batch_with_stub_captioner(tmp_path):
    rng = np.random.RandomState(0)
    for v in range(3):
        d = tmp_path / f"vid{v}"
        d.mkdir()
        for i in range(4):
            Image.fromarray(rng.randint(0, 255, (24, 24, 3), np.uint8)).save(
                d / f"frame_{i:05d}.jpg"
            )
    (tmp_path / "not_a_video").mkdir()  # no frames -> excluded

    out = tmp_path / "caps.json"
    results = cf.run_batch(
        str(tmp_path), str(out), num_videos=2, emit_csv=True,
        captioner=lambda d: f"a person does something in {d.rsplit('/', 1)[-1]}",
        min_words=1,
    )
    assert len(results) == 2
    saved = json.loads(out.read_text())
    assert saved == results
    assert all(r["caption"].endswith(".") for r in results)
    csv_text = out.with_suffix(".csv").read_text()
    assert csv_text.startswith("video_id,caption")


def test_run_batch_drops_empty_captions(tmp_path):
    d = tmp_path / "v0"
    d.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(d / "frame_00000.jpg")
    out = tmp_path / "caps.json"
    results = cf.run_batch(str(tmp_path), str(out), captioner=lambda _: "")
    assert results == []


# ---------------------------------------------------------------------------
# HF-datasets MSVD preparation
# ---------------------------------------------------------------------------

def test_uniform_bin_indices_reference_semantics():
    # reference uniform_indices (prepare_msvd.py:106-112)
    assert pm.uniform_bin_indices(0, 4) == []
    assert pm.uniform_bin_indices(10, 1) == [0]
    assert pm.uniform_bin_indices(1, 4) == [0]
    assert pm.uniform_bin_indices(3, 8) == [0, 1, 2]
    got = pm.uniform_bin_indices(100, 4)
    step = 100 / 4.0
    assert got == [min(99, int(i * step + step / 2)) for i in range(4)]
    assert all(i < 100 for i in pm.uniform_bin_indices(100, 7))


def test_get_captions_and_video_path():
    ex = {"video": {"path": "/x/v1.mp4"}, "sentences": [" A Dog Runs ", ""]}
    assert pm.get_video_path(ex) == "/x/v1.mp4"
    assert pm.get_captions(ex) == ["a dog runs"]
    assert pm.get_video_path({"video": "/y.avi"}) == "/y.avi"
    assert pm.get_captions({"sentence": "One"}) == ["one"]
    with pytest.raises(ValueError):
        pm.get_video_path({"nope": 1})


def test_read_frames_auto_raises_with_hints():
    with pytest.raises(RuntimeError, match="decord|av"):
        pm.read_frames_auto("/nonexistent.mp4", 4)


def _stub_reader(video_path, num_frames):
    rng = np.random.RandomState(hash(video_path) % 1000)
    return [Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8))
            for _ in range(num_frames)]


def _stub_loader(name):
    return {
        "train": [
            {"video_id": "va", "video": {"path": "/fake/va.mp4"},
             "sentences": ["a cat plays"]},
            {"video_id": "vb", "video": "/fake/vb.mp4", "captions": ["b"]},
            {"video_id": "nocaps", "video": "/fake/nc.mp4"},       # skipped
        ],
        "test": [
            {"video_id": "vt", "video": "/fake/vt.mp4", "sentences": ["t"]},
        ],
    }


def test_prepare_hf_full_loop(tmp_path):
    counts = pm.prepare_hf(
        "stub/msvd", str(tmp_path), num_frames=3, image_size=32,
        reader=_stub_reader, loader=_stub_loader,
    )
    assert counts == {"train": 2, "test": 1}
    ann = json.loads((tmp_path / "train" / "annotations.json").read_text())
    assert {r["video_id"] for r in ann} == {"va", "vb"}
    rec = next(r for r in ann if r["video_id"] == "va")
    assert rec["captions"] == ["a cat plays"]
    assert rec["num_frames"] == 3
    frames = sorted((tmp_path / "train" / "va").glob("frame_*.jpg"))
    assert len(frames) == 3
    with Image.open(frames[0]) as im:
        assert im.size == (32, 32)  # BICUBIC-resized


def test_prepare_hf_resume_reuses_existing_dirs(tmp_path):
    calls = []

    def counting_reader(path, n):
        calls.append(path)
        return _stub_reader(path, n)

    pm.prepare_hf("stub", str(tmp_path), num_frames=2, image_size=32,
                  reader=counting_reader, loader=_stub_loader)
    first_calls = len(calls)
    pm.prepare_hf("stub", str(tmp_path), num_frames=2, image_size=32,
                  reader=counting_reader, loader=_stub_loader)
    assert len(calls) == first_calls  # second run decoded nothing
    ann = json.loads((tmp_path / "train" / "annotations.json").read_text())
    assert len(ann) == 2
