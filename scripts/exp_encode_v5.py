"""Round-4 encode experiments, second wave (after exp_encode_v4 showed all
attention retiles within noise): attack the remaining profiled waste
(/tmp/hlo_stats_encode_r4.csv, 296.5 ms/iter):

  proj+LN2 fusion   23.6 ms at 62%  -> fold the out-projection INTO the
                                       attention kernel (attnproj): the
                                       [G*S,768]x[768,768] matmul runs on
                                       the MXU at near-peak inside Mosaic,
                                       and LN2 stats stay an XLA fusion
  patchify copies   ~11 ms          -> XLA conv patch embed (conv) or a
                                       direct multi-dim dot_general (dg)
                                       instead of reshape/transpose+matmul

Usage: python scripts/exp_encode_v5.py [batch] [trials]
"""
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_caption_tpu.models import vit

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

NH, HD = 12, 64
H = NH * HD
S = 197
VMEM = 100 * 1024 * 1024

base_cfg = vit.ViTConfig(use_pallas_attention=True, use_pallas_pool=True)
params = vit.init_vit_params(jax.random.PRNGKey(0), base_cfg)
video = jnp.asarray(np.random.RandomState(0).randint(
    0, 255, (batch, 16, 3, 224, 224), np.uint8))
np.asarray(jax.tree.leaves(params)[0][0, 0])


# ---- attention + out-projection kernel ----

def _attnproj_kernel(qkv_ref, w_ref, b_ref, o_ref, att_ref, *, nh, hd, scale):
    blk = qkv_ref[:]                               # [G,S,3H]
    g, s, _ = blk.shape
    h = nh * hd
    for hi in range(nh):
        q = blk[:, :, hi * hd:(hi + 1) * hd]
        k = blk[:, :, h + hi * hd:h + (hi + 1) * hd]
        v = blk[:, :, 2 * h + hi * hd:2 * h + (hi + 1) * hd]
        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=-1).astype(blk.dtype)
        att_ref[:, :, hi * hd:(hi + 1) * hd] = jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(blk.dtype)
    flat = att_ref[:].reshape(g * s, h)
    o_ref[:, :, :] = (
        jax.lax.dot_general(flat, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        .reshape(g, s, h).astype(o_ref.dtype) + b_ref[:].astype(o_ref.dtype))


@partial(jax.jit, static_argnames=("num_heads", "g"))
def attnproj(qkv, w, b, num_heads, g):
    n, s, h3 = qkv.shape
    h = h3 // 3
    hd = h // num_heads
    kern = partial(_attnproj_kernel, nh=num_heads, hd=hd, scale=hd ** -0.5)
    return pl.pallas_call(
        kern, grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, s, h3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, h), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((g, s, h), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * num_heads * s * s * hd + 2 * n * s * h * h,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=n * num_heads * s * s),
    )(qkv, w, b)


def block_attnproj(x, blk, cfg):
    """_block with attention+proj in one kernel."""
    dt = x.dtype
    y = vit._layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
    qkv = y @ blk["qkv_w"].astype(dt) + blk["qkv_b"].astype(dt)
    x = x + attnproj(qkv, blk["proj_w"].astype(dt), blk["proj_b"].astype(dt),
                     cfg.num_heads, 8)
    y = vit._layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
    y = y @ blk["fc1_w"].astype(dt) + blk["fc1_b"].astype(dt)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=cfg.gelu_approx).astype(dt)
    y = y @ blk["fc2_w"].astype(dt) + blk["fc2_b"].astype(dt)
    return x + y


# ---- patchify variants ----

def patchify_conv(images, w, b, patch):
    """Patch embed as an XLA conv: [N,3,H,W] -> [N, gh*gw, 768]."""
    n = images.shape[0]
    # w is [patch*patch*3, 768] with (c,ky,kx) row order -> conv kernel
    wk = w.reshape(3, patch, patch, -1)            # [c,kh,kw,o]
    out = jax.lax.conv_general_dilated(
        images, wk, (patch, patch), "VALID",
        dimension_numbers=("NCHW", "IHWO", "NHWC"))
    return out.reshape(n, -1, w.shape[1]) + b


def patchify_dg(images, w, b, patch):
    """Patch embed as one dot_general with 3 contracting dims."""
    n, c, hh, ww = images.shape
    gh, gw = hh // patch, ww // patch
    x = images.reshape(n, c, gh, patch, gw, patch)
    wk = w.reshape(c, patch, patch, -1)
    # contract (c, ph, pw) = x dims (1,3,5) with wk dims (0,1,2)
    out = jax.lax.dot_general(x, wk, (((1, 3, 5), (0, 1, 2)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.reshape(n, gh * gw, -1).astype(images.dtype) + b


def run(name, trunk_fn):
    f = jax.jit(trunk_fn)
    out = f(params, video)
    np.asarray(out[0, 0])
    meds = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(TRIALS):
            out = f(params, video)
        np.asarray(out[0, 0])
        meds.append((time.perf_counter() - t0) * 1e3 / TRIALS)
    return statistics.median(meds), out


def encode_custom(p, v, cfg, block_fn=None, patch_fn=None):
    """vit_encode with a swapped block body / patch embed."""
    v = vit.normalize_pixels(v)
    b, t = v.shape[0], v.shape[1]
    frames = v.reshape(b * t, *v.shape[2:]).astype(cfg.dtype)
    enc = p
    if patch_fn is None:
        x = vit._patchify(frames, cfg.patch_size)
        x = x @ enc["patch_embed"]["w"].astype(cfg.dtype) + enc["patch_embed"]["b"].astype(cfg.dtype)
    else:
        x = patch_fn(frames, enc["patch_embed"]["w"].astype(cfg.dtype),
                     enc["patch_embed"]["b"].astype(cfg.dtype), cfg.patch_size)
    n = x.shape[0]
    cls = jnp.broadcast_to(enc["cls_token"].astype(cfg.dtype), (n, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + enc["pos_embed"].astype(cfg.dtype)
    bf = block_fn or (lambda xx, blk, c: vit._block(xx, blk, c))

    def body(carry, blk):
        return bf(carry, blk, cfg), None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    x = x[:, :1, :]
    x = vit._layer_norm(x, enc["norm_scale"], enc["norm_bias"])
    pooled = jnp.mean(x[:, 0, :].astype(jnp.float32).reshape(b, t, -1), axis=1).astype(x.dtype)
    out = pooled @ enc["head"]["w"].astype(pooled.dtype) + enc["head"]["b"].astype(pooled.dtype)
    return out.astype(jnp.float32)


t_base, ref = run("base", lambda p, v: vit.vit_encode(p, v, base_cfg))
print(f"{'base(vit_encode)':24s} {t_base:7.1f} ms  MFU {35969.651/t_base/1.97:5.1f}%", flush=True)

for name, kw in (
    ("custom-base", {}),
    ("attnproj", dict(block_fn=block_attnproj)),
    ("patch_conv", dict(patch_fn=patchify_conv)),
    ("patch_dg", dict(patch_fn=patchify_dg)),
    ("attnproj+conv", dict(block_fn=block_attnproj, patch_fn=patchify_conv)),
):
    try:
        t, out = run(name, lambda p, v, _kw=kw: encode_custom(p, v, base_cfg, **_kw))
    except Exception as exc:
        print(f"{name:24s} FAILED: {str(exc)[:140]}")
        continue
    dev = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"{name:24s} {t:7.1f} ms  MFU {35969.651/t/1.97:5.1f}%  rel dev {dev:.2e}",
          flush=True)
