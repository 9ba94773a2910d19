"""Capture an hlo_stats profile of the encode program at production batch.

Usage: python scripts/profile_encode.py [batch] [out_csv]
Same harness as profile_beam.py but for the prefix/encode stage — used to
attribute the gap between the measured 55.9% MFU and the matmul roofline
(VERDICT r2 weak #8: padding waste, layout copies, non-matmul self time).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
out_csv = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hlo_stats_encode.csv"

from video_caption_tpu.config import default_inference_config
from video_caption_tpu.engine import InferenceEngine

cfg = default_inference_config(ckpt="none.pt", num_frames=16)
eng = InferenceEngine(cfg)

video = jnp.asarray(np.random.RandomState(0).randint(
    0, 255, (batch, cfg.num_frames, 3, cfg.image_size, cfg.image_size), np.uint8))
jax.block_until_ready(video)

# warm (compile)
prefix = eng._prefix_fn(eng.params, video)
jax.block_until_ready(prefix)

import time

trace_dir = "/tmp/encode_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        t0 = time.perf_counter()
        prefix = eng._prefix_fn(eng.params, video)
        jax.block_until_ready(prefix)
        print("iter %.1f ms" % ((time.perf_counter() - t0) * 1e3))

import glob

from xprof.convert import raw_to_tool_data as rtd

paths = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
print("xplane:", paths)
data, ctype = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
if isinstance(data, bytes):
    data = data.decode()
with open(out_csv, "w") as f:
    f.write(data)
print("wrote", out_csv)

import csv
import io

rows = list(csv.DictReader(io.StringIO(data)))
key_col = None
for cand in ("Total Self Time (us)", "total_self_time_us", "Self time (us)"):
    if rows and cand in rows[0]:
        key_col = cand
        break
if key_col is None and rows:
    print("columns:", list(rows[0].keys()))
else:
    rows.sort(key=lambda r: -float(r[key_col] or 0))
    tot = sum(float(r[key_col] or 0) for r in rows)
    print(f"total self time: {tot/1e3:.1f} ms over 3 iters")
    # aggregate by category too
    by_cat = {}
    for r in rows:
        cat = (r.get("HLO Op Category") or r.get("hlo_category") or "?")
        by_cat[cat] = by_cat.get(cat, 0.0) + float(r[key_col] or 0)
    print("--- by category (ms over 3 iters) ---")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3:8.2f} ms  {cat}")
    print("--- top 25 ops ---")
    for r in rows[:25]:
        name = (r.get("HLO Op Name") or r.get("hlo_op_name") or "?")[:60]
        cat = (r.get("HLO Op Category") or r.get("hlo_category") or "?")[:28]
        exp = (r.get("HLO Op Expression") or r.get("hlo_op_expression") or "")[:140]
        print(f"{float(r[key_col])/1e3:8.2f} ms  {cat:28s} {name}")
        print(f"           {exp}")
