"""Batch inference over an annotation split — IN PROCESS.

The reference shells out ``python -m inference --emit_json`` per video and
regex-scrapes stdout (tools/batch_infer.py:29-73, SURVEY §3.4 process
boundary #2). Here the engine stays resident: the encoder/decoder programs
compile once and every video reuses them — removing per-video process spawn,
model load, and compile.

Retry-on-empty parity: a video whose three candidates all clean to "" is
retried once with the safe_sample preset (reference :65-73).

Usage:
    python -m video_caption_tpu.tools.batch_infer --ann_path ... --out out.csv
"""
from __future__ import annotations

import argparse
import csv
import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional

log = logging.getLogger(__name__)


def batch_infer(
    ann_path: str,
    out_csv: str,
    ckpt: str = "",
    num_frames: int = 8,
    limit: int = 0,
    split: Optional[str] = None,
    batch_size: int = 8,
    engine=None,
) -> List[Dict]:
    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import InferenceEngine
    from video_caption_tpu.preprocessing.frame_loader import list_frames

    overrides = {"num_frames": num_frames}
    if ckpt:
        overrides["ckpt"] = ckpt
    config = default_inference_config(**overrides)
    if engine is None:
        engine = InferenceEngine(config)

    records = json.loads(Path(ann_path).read_text(encoding="utf-8"))
    todo = []
    for rec in records:
        if split and rec.get("split") and rec["split"] != split:
            continue
        if limit and len(todo) >= limit:
            break
        frames_dir = rec.get("frames_dir", "")
        if not frames_dir or not list_frames(frames_dir):
            log.warning("skipping %s: no frames", rec.get("video_id"))
            continue
        todo.append(rec)

    rows: List[Dict] = []
    retry_engine = None
    chunks = [todo[s : s + batch_size] for s in range(0, len(todo), batch_size)]

    def results_pipelined():
        """Double-buffered: dispatch chunk N+1 (host decode + async upload +
        program enqueue) before collecting chunk N, so host work overlaps
        device compute."""
        pending = None
        for chunk in chunks:
            t0 = time.time()
            handle = engine.infer_batch_dispatch([rec["frames_dir"] for rec in chunk])
            if pending is not None:
                prev_chunk, prev_handle, prev_t0 = pending
                yield prev_chunk, engine.infer_batch_collect(prev_handle), time.time() - prev_t0
            pending = (chunk, handle, t0)
        if pending is not None:
            prev_chunk, prev_handle, prev_t0 = pending
            yield prev_chunk, engine.infer_batch_collect(prev_handle), time.time() - prev_t0

    for chunk, results, elapsed in results_pipelined():
        per_video_s = round(elapsed / max(len(chunk), 1), 3)
        for rec, res in zip(chunk, results):
            result = res.to_api_dict()
            if not any(result[k] for k in ("S1", "S2", "S3")):
                # retry once with changed presets (tools/batch_infer.py:65-73)
                if retry_engine is None:
                    retry_cfg = dataclasses.replace(
                        config, preset1="safe_sample", preset2="safe_sample",
                        preset3="natural",
                    )
                    retry_engine = InferenceEngine(
                        retry_cfg, params=engine.params, model_cfg=engine.model_cfg
                    )
                result = retry_engine.infer(rec["frames_dir"]).to_api_dict()
            rows.append({
                "video_id": rec.get("video_id", ""),
                "S1": result["S1"], "S2": result["S2"], "S3": result["S3"],
                "best_key": result["BEST"]["key"], "best_text": result["BEST"]["text"],
                "latency_s": per_video_s,
                "ref_caption": (rec.get("captions") or [""])[0],
            })

    out = Path(out_csv)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()) if rows else
                                ["video_id", "S1", "S2", "S3", "best_key", "best_text",
                                 "latency_s", "ref_caption"])
        writer.writeheader()
        writer.writerows(rows)
    log.info("wrote %d rows to %s", len(rows), out)
    return rows


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser()
    p.add_argument("--ann_path", required=True)
    p.add_argument("--out", default="outputs/batch_infer.csv")
    p.add_argument("--ckpt", default="")
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--split", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args(argv)
    batch_infer(args.ann_path, args.out, args.ckpt, args.num_frames, args.limit,
                args.split, args.batch_size)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
