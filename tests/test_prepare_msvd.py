"""MSVD preparation pipeline on a synthetic cv2-written video."""
import json
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from video_caption_tpu.scripts.prepare_msvd import extract_video_frames, prepare  # noqa: E402


@pytest.fixture(scope="module")
def video_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw")
    videos = root / "videos"
    videos.mkdir()
    rng = np.random.RandomState(0)
    for vid in ("vidA", "vidB"):
        writer = cv2.VideoWriter(
            str(videos / f"{vid}.avi"), cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48)
        )
        for _ in range(30):
            writer.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
        writer.release()
    ann = root / "annotations.txt"
    ann.write_text("vidA a man walks\nvidA someone strolls\nvidB a dog barks\n")
    return root


def test_extract_video_frames(video_dataset, tmp_path):
    n = extract_video_frames(
        str(video_dataset / "videos" / "vidA.avi"), tmp_path / "frames", num_frames=8,
        image_size=32,
    )
    assert n == 8
    assert len(list((tmp_path / "frames").glob("frame_*.jpg"))) == 8


def test_prepare_full_pipeline(video_dataset, tmp_path):
    counts = prepare(
        str(video_dataset / "videos"), str(video_dataset / "annotations.txt"),
        str(tmp_path / "out"), num_frames=4, image_size=32,
    )
    assert sum(counts.values()) == 2
    ann_files = list(Path(tmp_path / "out").glob("*/annotations.json"))
    assert ann_files
    records = [r for f in ann_files for r in json.loads(f.read_text())]
    assert {r["video_id"] for r in records} == {"vidA", "vidB"}
    for rec in records:
        frames = list(Path(rec["frames_dir"]).glob("frame_*.jpg"))
        assert len(frames) == rec["num_frames"] == 4
        assert rec["captions"]
    # prepared output is loadable by the dataloader
    from video_caption_tpu.data.data_loader import MSVDDataset

    ds = MSVDDataset(str(ann_files[0]), num_frames=2, image_size=32)
    assert len(ds) > 0
    assert ds[0]["video"].shape == (2, 3, 32, 32)


def test_prepare_msrvtt_pipeline(video_dataset, tmp_path):
    from video_caption_tpu.scripts.prepare_msrvtt import parse_videodatainfo, prepare

    info = {
        "videos": [
            {"video_id": "vidA", "split": "train", "category": 1},
            {"video_id": "vidB", "split": "validate", "category": 2},
        ],
        "sentences": [
            {"video_id": "vidA", "caption": "a man walks"},
            {"video_id": "vidA", "caption": "someone strolls"},
            {"video_id": "vidB", "caption": "a dog barks"},
        ],
    }
    info_path = tmp_path / "videodatainfo.json"
    info_path.write_text(json.dumps(info))

    records = parse_videodatainfo(str(info_path))
    assert records[0]["captions"] == ["a man walks", "someone strolls"]

    counts = prepare(str(info_path), str(video_dataset / "videos"),
                     str(tmp_path / "out"), num_frames=4, image_size=32)
    assert counts == {"train": 1, "val": 1}
    val_ann = json.loads((tmp_path / "out" / "val" / "annotations.json").read_text())
    assert val_ann[0]["video_id"] == "vidB"
    assert len(list(Path(val_ann[0]["frames_dir"]).glob("frame_*.jpg"))) == 4
