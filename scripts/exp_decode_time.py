"""Plain wall-clock timing of the decode groups (no profiler overhead):
beam / sampled / pipelined-grouped, median over trials.

Usage: python scripts/exp_decode_time.py [batch] [trials]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
trials = int(sys.argv[2]) if len(sys.argv) > 2 else 12

from video_caption_tpu.config import default_inference_config
from video_caption_tpu.engine import InferenceEngine

cfg = default_inference_config(ckpt="none.pt", num_frames=16)
eng = InferenceEngine(cfg)
video = jnp.asarray(np.random.RandomState(0).randint(
    0, 255, (batch, cfg.num_frames, 3, cfg.image_size, cfg.image_size), np.uint8))
jax.block_until_ready(video)
prefix = eng._prefix_fn(eng.params, video)
jax.block_until_ready(prefix)

_, group_list, _ = eng._fused_infer_program()
key = jax.random.PRNGKey(0)


def timed(name, fn):
    jax.block_until_ready(fn())  # compile + warm
    jax.block_until_ready(fn())
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:24s} {statistics.median(ts):7.1f} ms  (min {min(ts):.1f} max {max(ts):.1f})")


for gi, (dp, idxs, ia, ma) in enumerate(group_list):
    timed(f"group{gi} beams={dp.num_beams}",
          lambda dp=dp, ia=ia, ma=ma: eng.run_decode_group(prefix, dp, ia, ma, key))

def run_pipelined():
    outs = [eng.run_decode_group(prefix, dp, ia, ma, key)
            for dp, idxs, ia, ma in group_list]
    jax.block_until_ready(outs)

timed("grouped pipelined", run_pipelined)
