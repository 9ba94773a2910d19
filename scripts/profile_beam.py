"""Capture an hlo_stats profile of the beam decode program at production batch.

Usage: python scripts/profile_beam.py [batch] [out_csv]
Writes top self-time ops to stdout + full hlo_stats CSV to /tmp/hlo_stats.csv.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
out_csv = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hlo_stats.csv"
stage = sys.argv[3] if len(sys.argv) > 3 else "beam"

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
if stage == "unified":
    # the serving-default path since 2026-08-18: one program for all groups
    from video_caption_tpu.decode.unified import generate_unified

    dps = tuple(g[0] for g in group_list)
    prompts = tuple((jnp.asarray(g[2]), jnp.asarray(g[3])) for g in group_list)
    rngs = tuple(jax.random.PRNGKey(17 + i) for i in range(len(group_list)))

    def run():
        return generate_unified(eng.params["decoder"], eng.model_cfg.gpt2,
                                prefix, prompts, dps, rngs)[0]
    print("profiling unified over", len(group_list), "groups")
else:
    if stage == "beam":
        dp, idxs, ids_arr, mask_arr = group_list[0]
    else:
        dp, idxs, ids_arr, mask_arr = group_list[-1]
    print("profiling group:", dp, "rows:", len(idxs))

    def run():
        return eng.run_decode_group(prefix, dp, ids_arr, mask_arr, key)

# warm (compile)
out = run()
np.asarray(out.ravel()[:1])

import time

trace_dir = "/tmp/beam_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out.ravel()[:1])
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
