"""Reconstructed dataloader contract tests (SURVEY §2.6): batch shapes,
sampling invariants, missing-frame drops, misspelled-kwarg compatibility."""
import json

import numpy as np
import pytest
from PIL import Image

from video_caption_tpu.data.data_loader import MSVDDataset, _sample_indices, build_dataloader


class TinyTok:
    eos_token_id = 127
    pad_token_id = 127
    vocab_size = 128

    def encode(self, text):
        return [b % 127 for b in text.encode()]


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("msvd")
    records = []
    rng = np.random.RandomState(0)
    for vid in range(3):
        d = root / f"vid{vid}"
        d.mkdir()
        for i in range(6 if vid else 2):   # vid0 is short (2 frames)
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                d / f"frame_{i:05d}.jpg"
            )
        records.append({
            "video_id": f"vid{vid}", "split": "train",
            "captions": [f"caption one for {vid}", f"caption two for {vid}"],
            "frames_dir": str(d),
        })
    records.append({
        "video_id": "ghost", "split": "train", "captions": ["nothing"],
        "frames_dir": str(root / "missing"),
    })
    ann = root / "annotations.json"
    ann.write_text(json.dumps(records))
    return str(ann)


def test_sample_indices_contract():
    assert _sample_indices(2, 4) == [0, 1, 0, 1]          # cyclic pad
    assert len(_sample_indices(100, 8)) == 8              # uniform subsample
    assert _sample_indices(8, 8) == list(range(8))        # identity-ish
    assert _sample_indices(0, 4) == []


def test_dataset_drops_missing_and_expands_captions(dataset_dir, caplog):
    ds = MSVDDataset(dataset_dir, num_frames=4, image_size=32)
    assert len(ds) == 6  # 3 videos x 2 captions; ghost dropped
    item = ds[0]
    assert item["video"].shape == (4, 3, 32, 32)


def test_batch_shapes_and_misspelled_kwarg(dataset_dir):
    loader = build_dataloader(
        dataset_dir, TinyTok(), batch_size=2, max_len=16, num_frame=4,
        image_size=32, shuffle=False, num_wokers=0,   # sic — reference kwarg
    )
    batch = next(iter(loader))
    assert batch["video"].shape == (2, 4, 3, 32, 32)
    assert batch["video"].dtype == np.float32
    assert batch["caption_ids"].shape == (2, 16)
    assert batch["attention_mask"].shape == (2, 16)
    assert len(batch["video_id"]) == 2
    # every caption ends with eos before padding
    for ids, mask in zip(batch["caption_ids"], batch["attention_mask"]):
        last_real = int(mask.sum()) - 1
        assert ids[last_real] == 127


def test_prefetch_worker_equivalent(dataset_dir):
    a = build_dataloader(dataset_dir, TinyTok(), batch_size=2, max_len=8,
                         num_frame=4, image_size=32, shuffle=False, num_workers=0)
    b = build_dataloader(dataset_dir, TinyTok(), batch_size=2, max_len=8,
                         num_frame=4, image_size=32, shuffle=False, num_workers=1)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["caption_ids"], bb["caption_ids"])
        np.testing.assert_allclose(ba["video"], bb["video"])


def test_uint8_pixels_mode(dataset_dir):
    import jax.numpy as jnp

    from video_caption_tpu.models.vit import normalize_pixels

    fp32 = build_dataloader(dataset_dir, TinyTok(), batch_size=2, max_len=8,
                            num_frame=4, image_size=32, shuffle=False)
    u8 = build_dataloader(dataset_dir, TinyTok(), batch_size=2, max_len=8,
                          num_frame=4, image_size=32, shuffle=False, uint8_pixels=True)
    bf, bu = next(iter(fp32)), next(iter(u8))
    assert bu["video"].dtype == np.uint8
    normalized = np.asarray(normalize_pixels(jnp.asarray(bu["video"])))
    assert np.abs(normalized - bf["video"]).max() < 0.02
