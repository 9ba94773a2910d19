"""Batched ViT encoder attention as a single-pass Pallas kernel.

The encoder's hot op is softmax(Q K^T / sqrt(d)) V over 197-token sequences,
batched over (frames x heads). At production batch sizes (32 videos x 16
frames x 12 heads) XLA schedules this as separate batched-matmul / softmax /
batched-matmul programs and streams the [M,S,S] logits tensor through HBM
between them. A 197x64 head-sequence is small enough that q, k, v AND the
logits tile all fit in VMEM at once, so one Pallas program per group of
``g`` frames runs the whole matmul-softmax-matmul chain on-core with zero
HBM traffic for the intermediates.

The kernel consumes the RAW fused-QKV activation ``[N, S, 3H]`` and emits
``[N, S, H]`` with heads re-merged, using only static minor-dim slices per
head. This layout contract matters as much as the fusion: a first version
taking pre-split ``[N*nh, S, hd]`` q/k/v forced XLA to materialize four
layout copies around the custom call — 4.9 ms/layer, 59 ms of a 242 ms
encode (profiler: copy.23/24/25/26/27). Consuming the matmul's own output
shape deletes them.

No flash-attention tiling is needed (or helpful) at S=197 — this is the
"whole problem in VMEM" regime; jax's tpu flash_attention kernel measured
~8x SLOWER here because its 128-block machinery pads 197 -> 256 and runs a
grid of tiny tiles.

Math matches the XLA einsum path in models/vit.py::_attention (f32 logits
and softmax, compute-dtype attention weights, f32-accumulated AV); end-to-end
encoder outputs agree to bf16 rounding (the fused XLA schedule reassociates
slightly), well inside the deployment bf16-vs-fp32 alignment gate (5e-2).

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

_GROUP_CANDIDATES = (8, 4, 2, 1)   # frames per program
_VMEM_LIMIT = 100 * 1024 * 1024


def _attn_qkv_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int, scale: float):
    blk = qkv_ref[:]                               # [G, S, 3H]
    h = num_heads * head_dim
    # per-head static slices on the minor dim — no transposes, no reshapes
    for hi in range(num_heads):
        q = blk[:, :, hi * head_dim:(hi + 1) * head_dim]           # [G,S,hd]
        k = blk[:, :, h + hi * head_dim:h + (hi + 1) * head_dim]
        v = blk[:, :, 2 * h + hi * head_dim:2 * h + (hi + 1) * head_dim]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale                                  # [G, S, S] f32
        attn = jax.nn.softmax(logits, axis=-1).astype(blk.dtype)
        out = jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        o_ref[:, :, hi * head_dim:(hi + 1) * head_dim] = out


@partial(jax.jit, static_argnames=("num_heads", "g"))
def _batched_attention(qkv: jax.Array, num_heads: int, g: int) -> jax.Array:
    n, s, h3 = qkv.shape
    h = h3 // 3
    hd = h // num_heads
    kern = partial(_attn_qkv_kernel, num_heads=num_heads, head_dim=hd, scale=hd ** -0.5)
    return pl.pallas_call(
        kern,
        grid=(n // g,),
        in_specs=[pl.BlockSpec((g, s, h3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, h), qkv.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * num_heads * s * s * hd,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=n * num_heads * s * s,
        ),
    )(qkv)


def _xla_reference(qkv: jax.Array, num_heads: int) -> jax.Array:
    """Pure-XLA mirror of the kernel's math ([N,S,3H] -> [N,S,H]); used as
    the recompute-based backward for the custom VJP (Pallas kernels have no
    autodiff rule — without this, stage-1 JOINT training, which backprops
    through the encoder, could not enable the kernel)."""
    n, s, h3 = qkv.shape
    h = h3 // 3
    hd = h // num_heads
    r = qkv.reshape(n, s, 3, num_heads, hd)
    q = r[:, :, 0].transpose(0, 2, 1, 3)
    k = r[:, :, 1].transpose(0, 2, 1, 3)
    v = r[:, :, 2].transpose(0, 2, 1, 3)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    attn = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(n, s, h)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _attention_with_vjp(qkv: jax.Array, num_heads: int, g: int) -> jax.Array:
    return _batched_attention(qkv, num_heads, g)


def _attention_fwd(qkv, num_heads, g):
    return _batched_attention(qkv, num_heads, g), qkv


def _attention_bwd(num_heads, g, qkv, grad_out):
    # recompute the XLA reference and differentiate it — same math as the
    # kernel (f32 logits/softmax), so gradients agree to bf16 rounding
    _, vjp = jax.vjp(lambda a: _xla_reference(a, num_heads), qkv)
    return vjp(grad_out)


_attention_with_vjp.defvjp(_attention_fwd, _attention_bwd)


def _pick_group(n: int, s: int, h: int, itemsize: int) -> Optional[int]:
    for g in _GROUP_CANDIDATES:
        if n % g:
            continue
        # double-buffered in/out blocks + one head's f32 logits tile
        block_bytes = 2 * g * s * 4 * h * itemsize + g * s * s * 4
        if block_bytes <= _VMEM_LIMIT // 2:
            return g
    return None


def encoder_attention(qkv: jax.Array, num_heads: int) -> Optional[jax.Array]:
    """Fused-QKV activation [N, S, 3H] -> attention output [N, S, H] with
    heads merged, or None (caller falls back to the XLA einsum path in
    models/vit.py::_attention)."""
    global last_backend, last_error
    from video_caption_tpu.ops.pallas.platform import on_tpu

    if not on_tpu():
        last_backend, last_error = "xla-fallback", "non-TPU backend"
        return None
    if qkv.ndim != 3 or qkv.shape[-1] % (3 * num_heads):
        last_backend, last_error = "xla-fallback", "unsupported shape"
        return None
    n, s, h3 = qkv.shape
    hd = h3 // 3 // num_heads
    if hd % 8 or s < 2:
        last_backend, last_error = "xla-fallback", "unaligned head dim"
        return None
    g = _pick_group(n, s, h3 // 3, qkv.dtype.itemsize)
    if g is None:
        last_backend, last_error = "xla-fallback", "no viable group size"
        return None
    try:
        out = _attention_with_vjp(qkv, num_heads, g)
        last_backend, last_error = "pallas", None
        return out
    except Exception as exc:  # pragma: no cover - compile failure path
        last_backend, last_error = "xla-fallback", str(exc)
        log.warning("pallas encoder attention failed; falling back to XLA: %s", exc)
        return None
