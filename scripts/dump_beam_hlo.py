"""Compile the beam decode program for TPU and dump its optimized HLO.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/dump_beam_hlo.py [out.txt]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/beam_opt_hlo.txt"

from video_caption_tpu.config import default_inference_config
from video_caption_tpu.decode.generate import generate_prefixed
from video_caption_tpu.decode.presets import preset_to_kwargs
from video_caption_tpu.engine import (
    InferenceEngine, load_params, model_config_from_inference,
)

cfg = default_inference_config(ckpt="none.pt", num_frames=16)
eng = InferenceEngine(cfg)
_, group_list, _ = eng._fused_infer_program()
dp, idxs, ids_arr, mask_arr = group_list[0]
print("group:", dp, "rows:", len(idxs))

batch = 64
v = batch
mc = eng.model_cfg
prefix = jnp.zeros((v * len(idxs), mc.prefix_len, mc.gpt2.n_embd))
ids = jnp.asarray(np.tile(ids_arr, (v, 1)))
mask = jnp.asarray(np.tile(mask_arr, (v, 1)))
key = jax.random.PRNGKey(0)

t0 = time.perf_counter()
lowered = generate_prefixed.lower(
    eng.params["decoder"], mc.gpt2, prefix, ids, mask, dp, key)
compiled = lowered.compile()
print(f"compile {time.perf_counter()-t0:.1f}s")
txt = compiled.as_text()
with open(out_path, "w") as f:
    f.write(txt)
print("wrote", out_path, len(txt), "chars")

# timing check
import statistics
args = (eng.params["decoder"], prefix, ids, mask, key)


def run():
    out = generate_prefixed(eng.params["decoder"], mc.gpt2, prefix, ids, mask, dp, key)
    np.asarray(out.ravel()[:1])


run()
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    run()
    ts.append(time.perf_counter() - t0)
print(f"beam program: {statistics.median(ts)*1e3:.1f} ms median of 5")
