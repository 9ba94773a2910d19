"""Fused single-token decode attention Pallas kernel.

One decode step attends one query token against the static KV cache:

    y[b,h,:] = softmax_l(q[b,h,:] . k[b,l,h,:] * scale + mask[b,l]) @ v[b,l,h,:]

One program per batch row: the row's K/V cache block streams HBM->VMEM once
and the masked softmax+weighted-sum fuse on the VPU with fp32 accumulation —
the decode-path analog of the reference's fused CUDA ops (SURVEY §7 item:
"fused decode-step attention"). Gated by
``CompileConfig.use_pallas_decode_attention`` (default off — XLA's fusion of
this contraction is already strong; the kernel exists for the hot-op
experiment surface) with the usual graceful fallback.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = logging.getLogger(__name__)

last_backend: Optional[str] = None
last_error: Optional[str] = None


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)                       # [nh, hd]
    k = k_ref[0].astype(jnp.float32)                       # [L, nh, hd]
    v = v_ref[0].astype(jnp.float32)
    mask = mask_ref[0].astype(jnp.float32)                 # [L]
    logits = jnp.einsum("hd,lhd->hl", q, k) * scale        # [nh, L]
    logits = jnp.where(mask[None, :] > 0, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hl,lhd->hd", probs, v)               # [nh, hd]
    out_ref[0] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=())
def _decode_attention(q, k_cache, v_cache, valid):
    b, nh, hd = q.shape
    l = k_cache.shape[1]
    scale = hd ** -0.5
    return pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nh, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, nh, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, nh, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nh, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nh * hd * l,
            bytes_accessed=(k_cache.size + v_cache.size) * k_cache.dtype.itemsize,
            transcendentals=b * nh * l,
        ),
    )(q, k_cache, v_cache, valid)


def decode_attention(
    q: jax.Array,        # [B, nh, hd] — single query token per row
    k_cache: jax.Array,  # [B, L, nh, hd]
    v_cache: jax.Array,  # [B, L, nh, hd]
    valid: jax.Array,    # [B, L] int — 1 where the cache column is live
) -> Optional[jax.Array]:
    """Returns [B, nh, hd] or None (caller falls back to the XLA einsum path)."""
    global last_backend, last_error
    from video_caption_tpu.ops.pallas.platform import on_tpu

    if not on_tpu():
        # Mosaic lowering on non-TPU backends raises at the enclosing jit's
        # compile, past this try/except — gate before building the kernel
        last_backend, last_error = "xla-fallback", "non-TPU backend"
        return None
    if q.ndim != 3 or k_cache.shape[:2] != valid.shape:
        last_backend, last_error = "xla-fallback", "unsupported shapes"
        return None
    try:
        out = _decode_attention(q, k_cache, v_cache, valid.astype(jnp.int32))
        last_backend, last_error = "pallas", None
        return out
    except Exception as exc:  # pragma: no cover
        last_backend, last_error = "xla-fallback", str(exc)
        log.warning("pallas decode attention failed; using XLA: %s", exc)
        return None
