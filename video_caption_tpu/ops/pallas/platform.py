"""Shared platform gate for the Pallas kernels' fallback contract.

A Mosaic kernel that reaches XLA lowering on a non-TPU backend raises at
COMPILE time of the *enclosing* jit — after the kernel wrapper's own
try/except has already returned — so every kernel checks the backend BEFORE
building the pallas_call (the trap documented in ops/pallas/fused_pool.py's
Mosaic block-rule note; same graceful-fallback stance as the reference's
CUDA ops, cupy_vit_pool.py:139-152).
"""
from __future__ import annotations

import jax


def _interpret_mode_forced() -> bool:
    """True inside ``pltpu.force_tpu_interpret_mode()`` (tests run the
    kernels interpreted on CPU)."""
    try:
        from jax._src import config as jax_config

        return jax_config.pallas_tpu_interpret_mode_context_manager.value is not None
    except Exception:
        return False


def on_tpu() -> bool:
    """True when a Mosaic kernel can lower: TPU hardware (includes the
    experimental tunneled 'axon' platform, whose devices are TPU chips) or a
    forced interpret-mode context."""
    if _interpret_mode_forced():
        return True
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    if getattr(dev, "platform", "") in ("tpu", "axon"):
        return True
    return getattr(dev, "device_kind", "").upper().startswith("TPU")
