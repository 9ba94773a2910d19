"""Pipelined in-process batch inference tool: chunking, ordering, CSV output."""
import csv
import json

import numpy as np
import pytest
from PIL import Image

from video_caption_tpu.config import default_inference_config
from video_caption_tpu.engine import InferenceEngine
from video_caption_tpu.tools.batch_infer import batch_infer


class TinyTok:
    eos_token_id = 127
    bos_token_id = 127
    pad_token_id = 127
    vocab_size = 128

    def encode(self, text):
        return [b % 127 for b in text.encode()] or [1]

    def decode(self, ids, skip_special_tokens=True):
        return "w" + "".join(str(int(i) % 10) for i in ids if int(i) != 127)


def test_batch_infer_pipelined(tiny_cfg, tiny_params, tmp_path):
    rng = np.random.RandomState(0)
    records = []
    for v in range(5):
        d = tmp_path / f"vid{v}"
        d.mkdir()
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                d / f"frame_{i:05d}.jpg"
            )
        records.append({"video_id": f"vid{v}", "captions": [f"ref {v}"],
                        "frames_dir": str(d)})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(records))

    cfg = default_inference_config(ckpt="missing.pt", num_frames=2, image_size=32)
    engine = InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)
    engine.tokenizer = TinyTok()

    out_csv = tmp_path / "out.csv"
    rows = batch_infer(str(ann), str(out_csv), num_frames=2, batch_size=2,
                       engine=engine)
    assert [r["video_id"] for r in rows] == [f"vid{v}" for v in range(5)]
    assert all(r["best_text"] for r in rows)
    with out_csv.open() as fh:
        written = list(csv.DictReader(fh))
    assert len(written) == 5
    assert written[0]["ref_caption"] == "ref 0"
