"""Batched ViT encoder attention as a single-pass Pallas kernel.

The encoder's hot op is softmax(Q K^T / sqrt(d)) V over 197-token sequences,
batched over (frames x heads). At production batch sizes (32 videos x 16
frames x 12 heads = 6144 head-sequences) XLA schedules this as separate
batched-matmul / softmax / batched-matmul programs and streams the [M,S,S]
logits tensor through HBM between them. A 197x64 head-sequence is small
enough that q, k, v AND the logits tile all fit in VMEM at once, so one
Pallas program per group of ``g`` head-sequences runs the whole
matmul-softmax-matmul chain on-core with zero HBM traffic for the
intermediates. Measured on v5e-1 at M=6144: 10.4 ms (XLA) -> 2.1 ms per
layer call, device time.

No flash-attention tiling is needed (or helpful) at S=197 — this is the
"whole problem in VMEM" regime; jax's tpu flash_attention kernel measured
~8x SLOWER here because its 128-block machinery pads 197 -> 256 and runs a
grid of tiny tiles.

Math is the same as the XLA path in models/vit.py::_attention (f32 logits
and softmax, compute-dtype attention weights, f32-accumulated AV); measured
standalone on v5e the two paths are bit-identical. Inside the full fused
encoder program XLA reassociates its own schedule slightly, so end-to-end
encoder outputs agree to bf16 rounding (max 7e-3 over a 12-block trunk),
well inside the deployment bf16-vs-fp32 alignment gate (5e-2).

Fallback contract (reference: core/operators/cupy_vit_pool.py:139-152):
``encoder_attention`` returns None for unsupported shapes/platforms and the
caller takes the pure-XLA einsum path.
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

# observability, mirroring CuPyLinearCompat.last_backend/last_error
# (cupy_linear_mapper.py:154-184)
last_backend: Optional[str] = None
last_error: Optional[str] = None

# Group sizes tried largest-first; throughput is flat across 8..16 on v5e
# (2.07-2.12 ms at M=6144) and falls off above 16 (2.42 ms at 24).
_GROUP_CANDIDATES = (16, 12, 8, 6, 4, 3, 2)
_VMEM_LIMIT = 100 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[:]                                   # [G, S, hd]
    k = k_ref[:]
    v = v_ref[:]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale                                      # [G, S, S] f32
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o_ref[:] = jax.lax.dot_general(
        attn, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("g",))
def _batched_attention(q: jax.Array, k: jax.Array, v: jax.Array, g: int) -> jax.Array:
    m, s, hd = q.shape
    kern = partial(_attn_kernel, scale=hd ** -0.5)
    spec = pl.BlockSpec((g, s, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(m // g,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, s, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * s * s * hd,
            bytes_accessed=4 * m * s * hd * q.dtype.itemsize,
            transcendentals=m * s * s,
        ),
    )(q, k, v)


def _pick_group(m: int, s: int, hd: int, itemsize: int) -> Optional[int]:
    for g in _GROUP_CANDIDATES:
        if m % g:
            continue
        # double-buffered in/out blocks + the f32 logits tile must fit VMEM
        block_bytes = 2 * 4 * g * s * hd * itemsize + g * s * s * 4
        if block_bytes <= _VMEM_LIMIT // 2:
            return g
    return None


def encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> Optional[jax.Array]:
    """[N, nh, S, hd] q/k/v -> [N, nh, S, hd] attention output, or None
    (caller falls back to the XLA einsum path in models/vit.py)."""
    global last_backend, last_error
    from video_caption_tpu.ops.pallas.platform import on_tpu

    if not on_tpu():
        last_backend, last_error = "xla-fallback", "non-TPU backend"
        return None
    if q.ndim != 4 or q.shape != k.shape or q.shape != v.shape:
        last_backend, last_error = "xla-fallback", "unsupported shape"
        return None
    n, nh, s, hd = q.shape
    m = n * nh
    if hd % 8 or s < 2:
        last_backend, last_error = "xla-fallback", "unaligned head dim"
        return None
    g = _pick_group(m, s, hd, q.dtype.itemsize)
    if g is None:
        last_backend, last_error = "xla-fallback", "no viable group size"
        return None
    try:
        out = _batched_attention(
            q.reshape(m, s, hd), k.reshape(m, s, hd), v.reshape(m, s, hd), g
        )
        last_backend, last_error = "pallas", None
        return out.reshape(n, nh, s, hd)
    except Exception as exc:  # pragma: no cover - compile failure path
        last_backend, last_error = "xla-fallback", str(exc)
        log.warning("pallas encoder attention failed; falling back to XLA: %s", exc)
        return None
