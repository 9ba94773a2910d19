"""Training-performance pass (VERDICT r4 #7): sweep batch size x compute
dtype on the real chip, with the prefetched-e2e input pipeline measured
alongside the serial one. Writes reports/roofline_training_sweep.json and
refreshes reports/roofline_training.json with the best device-MFU config.

Usage: python scripts/r5_train_perf.py
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_caption_tpu.bench.roofline import measure_training_step

rows = []
best = None
for dtype in ("float32", "bfloat16"):
    for batch in (8, 32, 64):
        try:
            r = measure_training_step(
                batch=batch, num_frames=8, trials=10, dtype=dtype,
                report_path=None)
        except Exception as exc:  # OOM at large fp32 batches is a finding
            r = {"batch": batch, "dtype": dtype, "error": str(exc)[:300]}
        rows.append(r)
        print(json.dumps(r), flush=True)
        if "error" not in r and r.get("pct_peak_flops") and (
                best is None or r["pct_peak_flops"] > best["pct_peak_flops"]):
            best = r

out = Path("reports/roofline_training_sweep.json")
out.parent.mkdir(exist_ok=True)
out.write_text(json.dumps({"sweep": rows, "best": best}, indent=1) + "\n")
if best is not None:
    Path("reports/roofline_training.json").write_text(
        json.dumps(best, indent=1) + "\n")
    print("BEST:", json.dumps(best))
