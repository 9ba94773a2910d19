"""A/B the decode kernels + unified program on hardware at production batch.

Builds one engine per CompileConfig variant and reports device-only median
times for the beam and sampled decode groups (through run_decode_group, the
serving dispatch point) plus the unified program when eligible. Variants:

  default      : lm_head + beam_attention kernels ON (current defaults)
  no_beam_attn : beam attention via the XLA _beam_attend path
  no_lm_head   : LM head + stats via the XLA fallback
  no_kernels   : both off (the r2 baseline path)

Usage: python scripts/ab_decode.py [batch] [trials]
Prints one JSON line per (variant, stage).
"""
import dataclasses
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5

from video_caption_tpu.config import default_inference_config
from video_caption_tpu.engine import InferenceEngine

VARIANTS = {
    "default": {},
    "no_beam_attn": {"use_pallas_beam_attention": False},
    "no_lm_head": {"use_pallas_lm_head": False},
    "no_kernels": {"use_pallas_beam_attention": False, "use_pallas_lm_head": False},
    "deferred_write": {"deferred_decode_cache_write": True},
    # round-3 contiguous [L,B,max_len,2,nh,hd] sampled-decode cache (the
    # (12,64)-minor layout the split path replaced; VERDICT r3 #3 A/B)
    "contig_sample": {"sample_split_cache": False},
    # opt-in int8 weight-only decoder (tokens may deviate from bf16 — the
    # documented tradeoff; this quantifies the speed side)
    "int8_decoder": {"quantize_decoder_int8": True},
}


def timed(fn, n):
    fn()  # warm/compile
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        out.append(time.perf_counter() - t0)
    return statistics.median(out) * 1e3


video = None
for name, overrides in VARIANTS.items():
    cfg = default_inference_config(ckpt="none.pt", num_frames=16)
    cfg = dataclasses.replace(
        cfg, compile=dataclasses.replace(cfg.compile, **overrides))
    eng = InferenceEngine(cfg)
    if video is None:
        video = jnp.asarray(np.random.RandomState(0).randint(
            0, 255, (batch, cfg.num_frames, 3, cfg.image_size, cfg.image_size),
            np.uint8))
        jax.block_until_ready(video)
    prefix = eng._prefix_fn(eng.params, video)
    jax.block_until_ready(prefix)
    _, group_list, _ = eng._fused_infer_program()
    key = jax.random.PRNGKey(0)
    total = 0.0
    for gi, (dp, idxs, ids_arr, mask_arr) in enumerate(group_list):
        ms = timed(lambda d=dp, ia=ids_arr, ma=mask_arr:
                   eng.run_decode_group(prefix, d, ia, ma, key), trials)
        total += ms
        print(json.dumps({
            "variant": name,
            "stage": f"decode[beams={dp.num_beams},rows={len(idxs)}]",
            "ms": round(ms, 1)}), flush=True)
    print(json.dumps({"variant": name, "stage": "decode_total",
                      "ms": round(total, 1)}), flush=True)
    # unified mixed-policy program over the same groups (SURVEY hard part 6
    # A/B: one weight stream for all rows vs per-group programs)
    try:
        from video_caption_tpu.decode.generate import DecodeParams  # noqa: F401
        from video_caption_tpu.decode.unified import generate_unified

        dps = tuple(g[0] for g in group_list)
        prompts = tuple((jnp.asarray(g[2]), jnp.asarray(g[3]))
                        for g in group_list)
        rngs = tuple(jax.random.PRNGKey(17 + i)
                     for i in range(len(group_list)))
        gcfg = eng.model_cfg.gpt2
        ms_u = timed(lambda: generate_unified(
            eng.params["decoder"], gcfg, prefix, prompts, dps, rngs)[0],
            trials)
        print(json.dumps({"variant": name, "stage": "decode_unified",
                          "ms": round(ms_u, 1)}), flush=True)
    except Exception as exc:
        print(json.dumps({"variant": name, "stage": "decode_unified",
                          "error": str(exc)[:200]}), flush=True)
    # kernel engagement check (fallback silently degrades to XLA)
    if name == "default":
        from video_caption_tpu.ops.pallas import beam_attention, lm_head
        print(json.dumps({
            "variant": name, "stage": "kernel_backends",
            "beam_attention": beam_attention.last_backend,
            "beam_attention_err": beam_attention.last_error,
            "lm_head": lm_head.last_backend,
            "lm_head_err": lm_head.last_error}), flush=True)
    del eng
