"""Fused spatial-pool + temporal-mean Pallas kernel.

TPU equivalent of the reference's CUDA kernels ``vit_pool_cls_*`` /
``vit_pool_gap_*`` (core/operators/cupy_vit_pool.py:23-104): one pass over
the ViT token tensor producing per-video features,

    cls: y[b, h] = mean_t x[b*T + t, 0, h]
    gap: y[b, h] = mean_t mean_{s>0} x[b*T + t, s, h]

Grid: one program per video; the [T, S, H] token block for that video's
frames streams HBM->VMEM once and reduces on the VPU with fp32 accumulation
(the reference kernels also accumulate fp32, cupy_vit_pool.py:64-104).

Fallback contract (cupy_vit_pool.py:139-152): ``fused_pool_temporal``
returns None for unsupported shapes/platforms and the caller takes the
pure-XLA path in models/vit.py::pool_temporal.
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


def _pool_kernel(x_ref, out_ref, *, frames: int, gap: bool):
    x = x_ref[:].astype(jnp.float32)          # [T, S, H]
    if gap:
        pooled = jnp.mean(x[:, 1:, :], axis=(0, 1), keepdims=False)
    else:
        pooled = jnp.mean(x[:, 0, :], axis=0)
    out_ref[:] = pooled[None, None, :].astype(out_ref.dtype)


def _xla_pool(tokens: jax.Array, batch: int, frames: int, mode: str) -> jax.Array:
    """Pure-XLA mirror of the kernel's math (models/vit.py::pool_temporal's
    fallback branch) — the recompute-based backward for the custom VJP, so
    stage-1 JOINT training (which backprops through the encoder) can keep
    the kernel instead of tripping Pallas's missing autodiff rule."""
    if mode == "gap":
        per_frame = jnp.mean(tokens[:, 1:, :].astype(jnp.float32), axis=1)
    else:
        per_frame = tokens[:, 0, :].astype(jnp.float32)
    out = jnp.mean(per_frame.reshape(batch, frames, -1), axis=1)
    return out.astype(tokens.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _pool_with_vjp(tokens: jax.Array, batch: int, frames: int, mode: str) -> jax.Array:
    return _fused_pool(tokens, batch, frames, mode)


def _pool_fwd(tokens, batch, frames, mode):
    return _fused_pool(tokens, batch, frames, mode), tokens


def _pool_bwd(batch, frames, mode, tokens, grad_out):
    _, vjp = jax.vjp(lambda t: _xla_pool(t, batch, frames, mode), tokens)
    return vjp(grad_out)


_pool_with_vjp.defvjp(_pool_fwd, _pool_bwd)


@partial(jax.jit, static_argnames=("batch", "frames", "mode"))
def _fused_pool(tokens: jax.Array, batch: int, frames: int, mode: str) -> jax.Array:
    bt, s, h = tokens.shape
    kernel = partial(_pool_kernel, frames=frames, gap=(mode == "gap"))
    # Output is [B, 1, H] so each program's block (1, 1, H) has its last two
    # dims equal to the array's — the Mosaic block-shape rule; a (1, H) block
    # of a [B, H] array is rejected when B > 1.
    out = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((frames, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 1, h), tokens.dtype),
        cost_estimate=pl.CostEstimate(
            flops=bt * s * h, bytes_accessed=tokens.size * tokens.dtype.itemsize, transcendentals=0
        ),
    )(tokens)
    return out[:, 0, :]


def fused_pool_temporal(
    tokens: jax.Array, batch: int, frames: int, mode: str = "cls"
) -> Optional[jax.Array]:
    """[B*T, S, H] -> [B, H] or None (caller falls back to XLA)."""
    global last_backend, last_error
    from video_caption_tpu.ops.pallas.platform import on_tpu

    if not on_tpu():
        # a Mosaic kernel inside an outer jit fails at the OUTER compile on
        # non-TPU backends, escaping this function's try/except — gate early
        last_backend, last_error = "xla-fallback", "non-TPU backend"
        return None
    if tokens.ndim != 3 or tokens.shape[0] != batch * frames or mode not in ("cls", "gap"):
        last_backend, last_error = "xla-fallback", "unsupported shape/mode"
        return None
    if tokens.shape[-1] % 128 != 0:
        last_backend, last_error = "xla-fallback", "lane-unaligned hidden dim"
        return None
    try:
        out = _pool_with_vjp(tokens, batch, frames, mode)
        last_backend, last_error = "pallas", None
        return out
    except Exception as exc:  # pragma: no cover - compile failure path
        last_backend, last_error = "xla-fallback", str(exc)
        log.warning("pallas fused pool failed; falling back to XLA: %s", exc)
        return None
