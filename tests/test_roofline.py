"""Roofline / device-only throughput measurement (bench/roofline.py) — the
run_ncu.ps1 analog (reference: scripts/run_ncu.ps1:1-12)."""
import json

import numpy as np
import pytest

from video_caption_tpu.bench import roofline as rl


@pytest.fixture(scope="module")
def tiny_engine(tiny_cfg):
    from video_caption_tpu.config import InferenceConfig
    from video_caption_tpu.engine import InferenceEngine

    cfg = InferenceConfig(ckpt="/nonexistent.pt", num_frames=2, image_size=32)
    return InferenceEngine(cfg, model_cfg=tiny_cfg)


def test_measure_roofline(tiny_engine, tmp_path):
    path = tmp_path / "roofline.json"
    res = rl.measure_roofline(tiny_engine, batch=2, trials=2, report_path=str(path))
    assert res["device_caps_per_sec"] > 0
    assert res["batch"] == 2
    names = [s["stage"] for s in res["stages"]]
    assert names[0] == "encode"
    assert any(n.startswith("decode[") for n in names)
    for s in res["stages"]:
        assert s["device_ms"] > 0
        assert s["gflops"] > 0
        assert s["gbytes"] > 0
    saved = json.loads(path.read_text())
    assert saved["stages"] == res["stages"]


def test_analytic_flops_scale_with_geometry(tiny_cfg):
    small = rl.vit_encode_flops(tiny_cfg, num_frames=2)
    big = rl.vit_encode_flops(tiny_cfg, num_frames=4)
    assert big > small * 1.9  # frames dominate

    g = tiny_cfg.gpt2
    f1 = rl.decode_group_flops(g, rows=1, num_beams=1, prefill_len=4,
                               max_new_tokens=8, max_len=12)
    f2 = rl.decode_group_flops(g, rows=1, num_beams=4, prefill_len=4,
                               max_new_tokens=8, max_len=12)
    assert f2 > f1  # beams expand decode rows


def test_chip_peaks_none_on_cpu():
    assert rl.chip_peaks() is None  # tests pin the CPU backend
