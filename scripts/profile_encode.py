"""Capture an hlo_stats profile of the encode program at production batch.

Usage: python scripts/profile_encode.py [batch] [out_csv]
Same harness as profile_beam.py but for the prefix/encode stage — used to
attribute the gap between the measured 55.9% MFU and the matmul roofline
(VERDICT r2 weak #8: padding waste, layout copies, non-matmul self time).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True), key=os.path.getmtime)
print("xplane:", paths[-1])
data, ctype = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
if isinstance(data, bytes):
    data = data.decode()
with open(out_csv, "w") as f:
    f.write(data)
print("wrote", out_csv)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from hlo_stats_util import parse_hlo_stats, print_hlo_stats

print_hlo_stats(parse_hlo_stats(data), iters=3)
