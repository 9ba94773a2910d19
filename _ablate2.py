import time, statistics
import numpy as np
import jax, jax.numpy as jnp
from video_caption_tpu.models import gpt2 as g2
from video_caption_tpu.decode.generate import DecodeParams, generate_prefixed

def sync(o):
    np.asarray(o.ravel()[:1]); return o

cfg = g2.GPT2Config()
params = g2.init_gpt2_params(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
B, P, L = 64, 4, 9   # bench core-beam group at bs=32: 32 videos x 2 rows
prefix = jnp.zeros((B, P, 768), jnp.bfloat16)
ids = jnp.zeros((B, L), jnp.int32)
mask = jnp.ones((B, L), jnp.int32)
rng = jax.random.PRNGKey(0)
variants = {
    "full_beam3":    DecodeParams(num_beams=3, max_new_tokens=24),
    "beam3_noproc":  DecodeParams(num_beams=3, max_new_tokens=24, repetition_penalty=1.0, no_repeat_ngram_size=0, min_new_tokens=0),
    "greedy_proc":   DecodeParams(num_beams=1, max_new_tokens=24),
    "greedy_noproc": DecodeParams(num_beams=1, max_new_tokens=24, repetition_penalty=1.0, no_repeat_ngram_size=0, min_new_tokens=0),
    "sampled_full":  DecodeParams(num_beams=1, max_new_tokens=24, temperature=0.9, top_p=0.9, top_k=50, repetition_penalty=1.05),
}
for name, dp in variants.items():
    sync(generate_prefixed(params, cfg, prefix, ids, mask, dp, rng))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(generate_prefixed(params, cfg, prefix, ids, mask, dp, rng))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name}: {med*1e3:.1f} ms ({med/24*1e3:.2f} ms/step)", flush=True)
