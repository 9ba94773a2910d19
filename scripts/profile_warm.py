"""Attribute the warm-cache host gap (VERDICT r4 #5): device-only 156.6 vs
warm-cache 117.6 captions/s = ~135 ms/batch of host work at bs=64 that is
invisible to the roofline. Phase-times one warm batch end to end:

  cache_get   64x _video_cache_get (glob + 40 stats per dir)
  concat      jnp.concatenate of the 64 cached [1,T,3,H,W] slots
  dispatch    _dispatch_videos (prefix + decode-group enqueues, async)
  device_get  blocking fetch of the decode outputs
  postprocess tokenizer decode + clean_text + select_best

Usage: python scripts/profile_warm.py [batch] [reps]
"""
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

from PIL import Image

from video_caption_tpu.config import InferenceConfig
from video_caption_tpu.engine import InferenceEngine

dirs = []
for d_idx in range(batch):
    d = tempfile.mkdtemp(prefix=f"vct_warm_{d_idx}_")
    rng = np.random.RandomState(d_idx)
    for i in range(40):
        Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8)).save(
            f"{d}/frame_{i:05d}.jpg", quality=95)
    dirs.append(d)

cfg = InferenceConfig(ckpt="none.pt", num_frames=16)
eng = InferenceEngine(cfg)
eng._video_cache_bytes = max(eng._video_cache_bytes, 512 << 20)

# fill the cache + compile the batched programs
eng.infer_batch(dirs)
eng.infer_batch(dirs)

phase = {k: [] for k in
         ("cache_get", "concat", "dispatch", "device_get", "postprocess",
          "e2e")}
for _ in range(reps):
    t_all = time.perf_counter()
    t0 = time.perf_counter()
    keys, slots = [], []
    for d in dirs:
        key, hit, _ = eng._video_cache_get(d)
        assert hit is not None, f"cache miss for {d}"
        keys.append(key)
        slots.append(hit)
    t1 = time.perf_counter()
    video = jnp.concatenate(slots, axis=0)
    t2 = time.perf_counter()
    handle = eng._dispatch_videos(video)
    t3 = time.perf_counter()
    outs = jax.device_get(list(handle[0]))
    t4 = time.perf_counter()
    # inline the collect postprocess on the fetched arrays
    _, group_list, n_pairs, v = handle
    from video_caption_tpu.postprocessing.candidate_ranker import select_best
    from video_caption_tpu.postprocessing.text_cleaner import clean_text

    texts = [[""] * n_pairs for _ in range(v)]
    for (dp, idxs, _, _), out in zip(group_list, outs):
        arr = np.asarray(out)
        for row in range(arr.shape[0]):
            vid, slot = divmod(row, len(idxs))
            text = eng.tokenizer.decode(arr[row], skip_special_tokens=True)
            texts[vid][idxs[slot]] = clean_text(text.strip())
    for t in texts:
        select_best([("S1", t[0]), ("S2", t[1]), ("S3", t[2])])
    t5 = time.perf_counter()
    phase["cache_get"].append(t1 - t0)
    phase["concat"].append(t2 - t1)
    phase["dispatch"].append(t3 - t2)
    phase["device_get"].append(t4 - t3)
    phase["postprocess"].append(t5 - t4)
    phase["e2e"].append(t5 - t_all)

print(f"warm batch={batch} reps={reps} (ms, median / mean / max)")
for k, v in phase.items():
    print(f"  {k:12s} {statistics.median(v)*1e3:8.1f} "
          f"{sum(v)/len(v)*1e3:8.1f} {max(v)*1e3:8.1f}")
dev = 1.0  # separator: device-only number from reports/roofline.json
try:
    import json

    r = json.load(open("reports/roofline.json"))
    print(f"  device_total {r['device_total_ms']:8.1f} (roofline)")
except Exception:
    pass
