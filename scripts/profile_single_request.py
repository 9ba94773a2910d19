"""Break down single-request latency: host JPEG decode, upload, program
dispatch, device compute, fetch, postprocess.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/profile_single_request.py [iters]
"""
import statistics
import sys
import tempfile
import time

import jax
import numpy as np

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

from PIL import Image

from video_caption_tpu.config import InferenceConfig
from video_caption_tpu.engine import InferenceEngine

dirs = []
for d_idx in range(8):
    d = tempfile.mkdtemp(prefix=f"vct_lat_{d_idx}_")
    rng = np.random.RandomState(d_idx)
    for i in range(40):
        Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8)).save(
            f"{d}/frame_{i:05d}.jpg", quality=95)
    dirs.append(d)

cfg = InferenceConfig(ckpt="none.pt", num_frames=16)
eng = InferenceEngine(cfg)
eng._video_cache_bytes = 0  # cold path every request

# warm all programs
for _ in range(3):
    eng.infer(dirs[0])

# whole-request latency through the PUBLIC surface (engine.infer) — this is
# the p50 the bench reports; with overlap_single_upload on (default) the
# per-chunk trunk dispatches overlap the wire (round-4 p50 lever). A/B via
# VIDEO_CAPTION_OVERLAP_UPLOAD=0.
infer_lat = []
for i in range(iters):
    d = dirs[i % len(dirs)]
    t0 = time.perf_counter()
    eng.infer(d)
    infer_lat.append(time.perf_counter() - t0)
print(f"infer()    p50 {statistics.median(infer_lat)*1e3:7.1f} ms   "
      f"mean {sum(infer_lat)/len(infer_lat)*1e3:7.1f}   "
      f"min {min(infer_lat)*1e3:7.1f}   max {max(infer_lat)*1e3:7.1f}   "
      f"(overlap_single_upload={eng.config.compile.overlap_single_upload})")

rows = {k: [] for k in ("load", "dispatch", "collect", "post", "total")}
for i in range(iters):
    d = dirs[i % len(dirs)]
    t0 = time.perf_counter()
    video = eng._load_video_to_device(d)
    jax.block_until_ready(video)
    t1 = time.perf_counter()
    handle = eng._dispatch_videos(video)
    t2 = time.perf_counter()
    texts = eng._collect_videos(handle)
    t3 = time.perf_counter()
    from video_caption_tpu.postprocessing.candidate_ranker import select_best
    select_best([("S1", texts[0][0]), ("S2", texts[0][1]), ("S3", texts[0][2])])
    t4 = time.perf_counter()
    rows["load"].append(t1 - t0)
    rows["dispatch"].append(t2 - t1)
    rows["collect"].append(t3 - t2)
    rows["post"].append(t4 - t3)
    rows["total"].append(t4 - t0)

for k, v in rows.items():
    print(f"{k:10s} p50 {statistics.median(v)*1e3:7.1f} ms   "
          f"mean {sum(v)/len(v)*1e3:7.1f}   min {min(v)*1e3:7.1f}   max {max(v)*1e3:7.1f}")

# sub-breakdown of load: JPEG decode vs device_put
from video_caption_tpu.preprocessing.frame_loader import list_frames, sample_frame_paths
from video_caption_tpu.native.loader import load_frames_native_yuv420

decode_t, put_t = [], []
size = cfg.image_size
for i in range(iters):
    d = dirs[i % len(dirs)]
    files = list_frames(d)
    picks = sample_frame_paths(files, cfg.num_frames)
    t0 = time.perf_counter()
    packed = load_frames_native_yuv420(picks, size)
    t1 = time.perf_counter()
    dv = jax.device_put(packed)
    jax.block_until_ready(dv)
    t2 = time.perf_counter()
    decode_t.append(t1 - t0)
    put_t.append(t2 - t1)
print(f"jpeg16     p50 {statistics.median(decode_t)*1e3:7.1f} ms  (all 16 frames, one shot)")
print(f"put16      p50 {statistics.median(put_t)*1e3:7.1f} ms  ({packed.nbytes/1e6:.2f} MB)")

# dispatch modes: fused single program vs unfused groups
video = eng._load_video_to_device(dirs[0])
jax.block_until_ready(video)

def timed(fn, n=iters):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3

program, group_list, n_pairs = eng._fused_infer_program()
key = jax.random.PRNGKey(0)

def run_fused():
    outs = program(eng.params, video, key)
    jax.device_get(list(outs))

print(f"fused      p50 {timed(run_fused):7.1f} ms  (1 dispatch + 1 fetch, device compute incl.)")

def run_groups():
    prefix = eng._prefix_fn(eng.params, video)
    outs = [eng.run_decode_group(prefix, dp, ia, ma, key)
            for dp, idxs, ia, ma in group_list]
    jax.device_get(outs)

print(f"groups     p50 {timed(run_groups):7.1f} ms  (1+{len(group_list)} dispatches)")
