"""A/B encoder variants on the chip at production batch (bs x 16 frames).

Hunting the 55.6% -> 60%+ MFU gap (VERDICT r2 #8). hlo_stats attribution
(2026-08-18, v5e, bs=64; /tmp/hlo_stats_encode.csv): MLP fusion 138 ms/iter
at 84% peak, QKV 46 ms at 95%, Pallas attention custom call 35 ms at ~21%
effective FLOPs, proj+LN fusion 24 ms at 61%, layout copies ~23 ms.

Variants:
  base           current defaults (pallas attn g=8, f32 GELU)
  gelu_bf16      MLP GELU evaluated in bf16 (VPU epilogue halved)
  attn_g4/g2     smaller pallas attention group (grid pipelining vs VMEM)
  xla_attn       no pallas attention (sanity: the kernel still wins?)

Usage: python scripts/exp_encode_variants.py [batch] [trials]
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
trials = int(sys.argv[2]) if len(sys.argv) > 2 else 10

from video_caption_tpu.models import vit
from video_caption_tpu.ops.pallas import encoder_attention as ea

base_cfg = vit.ViTConfig(use_pallas_attention=True, use_pallas_pool=True)
params = vit.init_vit_params(jax.random.PRNGKey(0), base_cfg)
video = jnp.asarray(np.random.RandomState(0).randint(
    0, 255, (batch, 16, 3, 224, 224), np.uint8))
jax.block_until_ready((params, video))


def run_variant(name, cfg, group_candidates=None):
    old = ea._GROUP_CANDIDATES
    if group_candidates is not None:
        ea._GROUP_CANDIDATES = group_candidates
    try:
        fn = jax.jit(lambda p, v: vit.vit_encode(p, v, cfg))
        out = fn(params, video)
        jax.block_until_ready(out)
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, video))
            ts.append((time.perf_counter() - t0) * 1e3)
        med = statistics.median(ts)
        print(f"{name:12s} {med:7.1f} ms   (min {min(ts):.1f}  max {max(ts):.1f})")
        return med, out
    finally:
        ea._GROUP_CANDIDATES = old


t0, out0 = run_variant("base", base_cfg)
t1, out1 = run_variant("gelu_bf16", vit.ViTConfig(
    use_pallas_attention=True, use_pallas_pool=True, gelu_f32=False))
err = float(jnp.max(jnp.abs(out1 - out0)) / (jnp.max(jnp.abs(out0)) + 1e-9))
print(f"  gelu_bf16 vs base: max rel dev {err:.2e}")
run_variant("attn_g4", base_cfg, group_candidates=(4,))
run_variant("attn_g2", base_cfg, group_candidates=(2,))
run_variant("xla_attn", vit.ViTConfig(use_pallas_attention=False, use_pallas_pool=True))
t_both, out_b = run_variant("both(g8+bf16gelu)", vit.ViTConfig(
    use_pallas_attention=True, use_pallas_pool=True, gelu_f32=False))
# trunk_2d variants removed in round 4: measured 335.9 vs 297.0 ms base on
# v5e bs=64 (13% slower; scripts/exp_encode_v4.py) — the 2D stream forced
# MORE relayout at the attention boundary than the 3D stream's per-layer copy
