import numpy as np, jax, jax.numpy as jnp
from video_caption_tpu.models import gpt2 as g2
from video_caption_tpu.decode.generate import DecodeParams, generate_prefixed
cfg = g2.GPT2Config()
params = g2.init_gpt2_params(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
B, P, L = 64, 4, 9
prefix = jnp.zeros((B, P, 768), jnp.bfloat16)
ids = jnp.zeros((B, L), jnp.int32)
mask = jnp.ones((B, L), jnp.int32)
rng = jax.random.PRNGKey(0)
dp = DecodeParams(num_beams=3, max_new_tokens=24)
def sync(o): np.asarray(o.ravel()[:1]); return o
sync(generate_prefixed(params, cfg, prefix, ids, mask, dp, rng))
with jax.profiler.trace("/tmp/jax_trace_beam"):
    for _ in range(3):
        sync(generate_prefixed(params, cfg, prefix, ids, mask, dp, rng))
print("trace done")
