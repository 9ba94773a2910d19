"""Temporal mean pool: [B,T,D] -> [B,D]
(reference mirror op: core/operators/temporal_pool.py:7-15)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def temporal_mean_pool(x: jax.Array) -> jax.Array:
    if x.ndim != 3:
        raise ValueError(f"expected [B,T,D], got {x.shape}")
    return jnp.mean(x, axis=1)
