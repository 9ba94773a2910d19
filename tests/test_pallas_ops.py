"""Pallas kernels vs the pure-XLA reference path — the accuracy-alignment
role reserved by core/scripts/accuracy_alignment.py. On CPU the kernels run
in interpreter mode via force_tpu_interpret_mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from video_caption_tpu.ops.pallas import fused_pool, prefix_projector


@pytest.fixture(autouse=True)
def _interpret_mode():
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("mode", ["cls", "gap"])
def test_fused_pool_matches_xla(mode):
    b, t, s, h = 2, 4, 5, 128
    tokens = jax.random.normal(jax.random.PRNGKey(0), (b * t, s, h), jnp.float32)
    out = fused_pool.fused_pool_temporal(tokens, b, t, mode)
    assert out is not None
    ref_frame = tokens[:, 0, :] if mode == "cls" else jnp.mean(tokens[:, 1:, :], axis=1)
    ref = jnp.mean(ref_frame.reshape(b, t, h), axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert fused_pool.last_backend == "pallas"


def test_fused_pool_fallback_on_bad_shape():
    tokens = jnp.zeros((7, 5, 100))  # 7 != b*t for b=2,t=4; unaligned h
    assert fused_pool.fused_pool_temporal(tokens, 2, 4, "cls") is None
    assert fused_pool.last_backend == "xla-fallback"


def test_prefix_projector_matches_matmul():
    b, d_in, d_out = 3, 128, 256
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (b, d_in), jnp.float32)
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * 0.02
    bias = jax.random.normal(key, (d_out,), jnp.float32)
    out = prefix_projector.prefix_project(x, w, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w + bias), rtol=1e-4, atol=1e-4)


def test_prefix_projector_unaligned_uses_xla():
    x = jnp.ones((2, 100))
    w = jnp.ones((100, 50))
    b = jnp.zeros((50,))
    out = prefix_projector.prefix_project(x, w, b)
    assert prefix_projector.last_backend == "xla-fallback"
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w + b))
