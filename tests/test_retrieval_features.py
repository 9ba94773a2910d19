"""Feature extraction + retrieval round trip (reference:
scripts/extract_features.py -> build_index -> eval_retrieval)."""
import json

import numpy as np
import pytest
from PIL import Image

from video_caption_tpu.retrieval.features import extract_features
from video_caption_tpu.retrieval.index import build_index


@pytest.fixture(scope="module")
def ann_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("feat_msvd")
    records = []
    rng = np.random.RandomState(0)
    for vid in range(5):
        d = root / f"v{vid}"
        d.mkdir()
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                d / f"frame_{i:05d}.jpg"
            )
        records.append({
            "video_id": f"v{vid}", "split": "train",
            "captions": [f"caption a {vid}", f"caption b {vid}"],
            "frames_dir": str(d),
        })
    ann = root / "annotations.json"
    ann.write_text(json.dumps(records))
    return str(ann)


def _stub_encoder(videos):
    """Deterministic per-video embedding from pixel stats (no model)."""
    v = np.asarray(videos, np.float32)
    flat = v.reshape(v.shape[0], -1)
    return np.stack([
        flat.mean(axis=1), flat.std(axis=1), flat[:, ::7].mean(axis=1),
        flat.max(axis=1),
    ], axis=1)


def test_extract_features_outputs(ann_path, tmp_path):
    feats, ids = extract_features(
        ann_path, str(tmp_path / "feat"), num_frames=2, image_size=32,
        batch_size=2, encoder=_stub_encoder,
    )
    assert feats.shape == (5, 4)
    assert sorted(ids) == [f"v{i}" for i in range(5)]
    # L2 normalized
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)
    # per-video .npy + consolidated artifacts
    saved = np.load(tmp_path / "feat" / "v0.npy")
    np.testing.assert_allclose(saved, feats[ids.index("v0")])
    all_feats = np.load(tmp_path / "feat" / "features.npy")
    assert all_feats.shape == feats.shape
    assert json.loads((tmp_path / "feat" / "ids.json").read_text()) == ids


def test_extract_features_dedups_videos_and_respects_limit(ann_path, tmp_path):
    feats, ids = extract_features(
        ann_path, str(tmp_path / "feat2"), num_frames=2, image_size=32,
        batch_size=3, limit=2, encoder=_stub_encoder,
    )
    assert len(ids) == len(set(ids)) == 2


def test_features_round_trip_through_index(ann_path, tmp_path):
    feats, ids = extract_features(
        ann_path, str(tmp_path / "feat3"), num_frames=2, image_size=32,
        batch_size=4, encoder=_stub_encoder,
    )
    index = build_index(feats, ids, str(tmp_path / "idx"))
    # each feature's own nearest neighbor is itself (IP on L2-normalized)
    scores, picks = index.search(feats, 1)
    assert [ids[p[0]] for p in picks] == ids
    np.testing.assert_allclose(scores[:, 0], 1.0, rtol=1e-5)
