"""Prefix normalization applied between projection and mapper
(reference: core/operators/normalization.py:6-13; used at core/engine.py:44-50).

``emb -> layer_norm(emb) * ln_scale * in_weight`` with each factor applied
only when > 0; fuses into the surrounding matmuls under jit.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_prefix_norm(
    emb: jax.Array,
    ln_scale: Optional[float] = 0.6,
    in_weight: Optional[float] = 0.4,
) -> jax.Array:
    if emb.ndim == 2:
        emb = emb[:, None, :]
    if ln_scale is not None and ln_scale > 0:
        xf = emb.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        emb = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * ln_scale).astype(emb.dtype)
    if in_weight is not None and in_weight > 0:
        emb = emb * in_weight
    return emb
