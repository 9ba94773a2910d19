"""Prefix-projection Pallas kernel: ``y = x @ W + b``.

TPU equivalent of the reference's ``linear_bias_f32/f16`` CUDA kernels
(core/operators/cupy_linear_mapper.py:14-70), which back the prefix mapper
Linear(video_dim -> n_embd * prefix_len). One MXU matmul with the bias add
fused; fp32 accumulation (the CUDA kernels also accumulate fp32).

The batch dim is padded to the fp32 sublane tile (8); 256 and 3072 are
already lane-aligned. Falls back to plain XLA (returns the XLA result, not
None — this op is tiny and the pure path is identical) on any failure,
mirroring CuPyLinearCompat's fallback (cupy_linear_mapper.py:157-184).
"""
from __future__ import annotations

import logging

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = logging.getLogger(__name__)

last_backend: Optional[str] = None
last_error: Optional[str] = None

_SUBLANE = 8


def _proj_kernel(x_ref, w_ref, b_ref, out_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (acc + b_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@jax.jit
def _prefix_project_pallas(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    bsz, d_in = x.shape
    d_out = w.shape[1]
    pad = (-bsz) % _SUBLANE
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _proj_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz + pad, d_out), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (bsz + pad) * d_in * d_out,
            bytes_accessed=(xp.size + w.size + b.size) * 4,
            transcendentals=0,
        ),
    )(xp, w.astype(x.dtype), b.reshape(1, -1))
    return out[:bsz]


@jax.custom_vjp
def _project_with_vjp(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    return _prefix_project_pallas(x, w, b)


def _project_fwd(x, w, b):
    return _prefix_project_pallas(x, w, b), (x, w)


def _project_bwd(res, g):
    # closed-form linear backward (the op IS x @ w + b) — lets the mapper
    # trainer differentiate through the kernel instead of tripping Pallas's
    # missing autodiff rule; fp32 accumulation matches the forward's
    x, w = res
    gf = g.astype(jnp.float32)
    dx = (gf @ w.astype(jnp.float32).T).astype(x.dtype)
    dw = (x.astype(jnp.float32).T @ gf).astype(w.dtype)
    db = jnp.sum(gf, axis=0).astype(g.dtype)
    return dx, dw, db


_project_with_vjp.defvjp(_project_fwd, _project_bwd)


def prefix_project(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """[B, d_in] @ [d_in, d_out] + [d_out]; Pallas when aligned, XLA otherwise."""
    global last_backend, last_error
    from video_caption_tpu.ops.pallas.platform import on_tpu

    d_in, d_out = w.shape
    if not on_tpu():
        # Mosaic lowering on non-TPU backends raises at the enclosing jit's
        # compile, past this try/except — gate before building the kernel
        last_backend, last_error = "xla-fallback", "non-TPU backend"
    elif d_in % 128 == 0 and d_out % 128 == 0:
        try:
            out = _project_with_vjp(x, w, b)
            last_backend, last_error = "pallas", None
            return out
        except Exception as exc:  # pragma: no cover
            last_backend, last_error = "xla-fallback", str(exc)
            log.warning("pallas prefix projector failed; using XLA: %s", exc)
    else:
        last_backend, last_error = "xla-fallback", "lane-unaligned dims"
    return x @ w + b
