"""Driver benchmark: captions/sec/chip + p50 video->caption latency on
16-frame clips (BASELINE.json north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Runs the full product path on the real chip: JPEG frames dir -> frame
loader -> ViT-B/16 encode (once) -> three decode presets (beam x2 + sample)
-> text cleaning -> best-of-3. Weights are random (no pretrained weights in
this environment) — latency is weight-independent. The reference publishes
no numbers (BASELINE.md), so ``vs_baseline`` compares against the previous
local run stored in reports/bench_history.json (1.0 on first run).
"""
from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def make_frames_dir(num_frames: int = 40, size=(240, 320)) -> str:
    from PIL import Image

    d = tempfile.mkdtemp(prefix="vct_bench_")
    rng = np.random.RandomState(0)
    for i in range(num_frames):
        Image.fromarray(rng.randint(0, 255, (*size, 3), np.uint8)).save(
            f"{d}/frame_{i:05d}.jpg", quality=95
        )
    return d


def main() -> None:
    from video_caption_tpu.config import InferenceConfig
    from video_caption_tpu.engine import InferenceEngine

    warmup = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    cfg = InferenceConfig(ckpt="checkpoints/msvd_mapper_finetune_v2.pt", num_frames=16)
    engine = InferenceEngine(cfg)
    frames = make_frames_dir()

    # single-stream latency (p50 video->caption)
    for _ in range(warmup):
        engine.infer(frames)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        engine.infer(frames)
        lat.append(time.perf_counter() - t0)
    p50 = statistics.median(lat)

    # chip throughput: batched multi-video inference (the production
    # batch/serving path — decode rows share GPT-2 weight bandwidth)
    try:
        dirs = [frames] * batch
        engine.infer_batch(dirs)  # compile batched programs
        # steady-state pipelined throughput: batch N+1's host work (JPEG
        # decode + upload + enqueue) overlaps batch N's device compute
        n_batches = max(iters // 3, 3)
        handle = engine.infer_batch_dispatch(dirs)
        t0 = time.perf_counter()
        for i in range(n_batches):
            nxt = engine.infer_batch_dispatch(dirs) if i < n_batches - 1 else None
            engine.infer_batch_collect(handle)
            handle = nxt
        caps_per_sec = batch * n_batches / (time.perf_counter() - t0)
    except Exception as exc:  # never leave the driver without a JSON line
        print(f"batched path failed ({exc}); reporting single-stream", file=sys.stderr)
        batch = 1
        caps_per_sec = 1.0 / (sum(lat) / len(lat))

    hist_path = Path("reports/bench_history.json")
    hist_path.parent.mkdir(exist_ok=True)
    first = None
    if hist_path.is_file():
        try:
            first = json.loads(hist_path.read_text())[0]["value"]
        except Exception:
            first = None
    # the reference publishes no numbers (BASELINE.md); baseline = the first
    # measurement recorded this build, so vs_baseline tracks cumulative gain
    vs_baseline = (caps_per_sec / first) if first else 1.0

    record = {
        "metric": "captions_per_sec_per_chip",
        "value": round(caps_per_sec, 4),
        "unit": "captions/s",
        "vs_baseline": round(vs_baseline, 4),
        "p50_latency_ms": round(p50 * 1000, 2),
        "batch_size": batch,
        "iters": iters,
    }
    history = []
    if hist_path.is_file():
        try:
            history = json.loads(hist_path.read_text())
        except Exception:
            history = []
    history.append(record)
    hist_path.write_text(json.dumps(history, indent=1))

    print(json.dumps({k: record[k] for k in ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    main()
