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


def test_decode_attention_matches_xla():
    from video_caption_tpu.ops.pallas import decode_attention as da

    b, l, nh, hd = 2, 16, 4, 64
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (b, nh, hd), jnp.float32)
    k = jax.random.normal(key, (b, l, nh, hd), jnp.float32)
    v = jax.random.normal(key, (b, l, nh, hd), jnp.float32)
    valid = jnp.concatenate([jnp.ones((b, 10), jnp.int32), jnp.zeros((b, 6), jnp.int32)], 1)
    out = da.decode_attention(q, k, v, valid)
    assert out is not None and da.last_backend == "pallas"

    scale = hd ** -0.5
    logits = jnp.einsum("bhd,blhd->bhl", q, k) * scale
    logits = jnp.where(valid[:, None, :] > 0, logits, -1e30)
    ref = jnp.einsum("bhl,blhd->bhd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_decode_attention_bad_shape_falls_back():
    from video_caption_tpu.ops.pallas import decode_attention as da

    out = da.decode_attention(
        jnp.zeros((2, 4, 64)), jnp.zeros((2, 16, 4, 64)), jnp.zeros((2, 16, 4, 64)),
        jnp.zeros((2, 5), jnp.int32),  # mismatched L
    )
    assert out is None and da.last_backend == "xla-fallback"


def test_gpt2_decode_with_pallas_attention_matches(tiny_params, tiny_cfg):
    """End-to-end greedy decode with the fused decode-attention kernel must
    produce identical tokens to the XLA path."""
    import dataclasses

    from video_caption_tpu.decode.generate import DecodeParams, generate

    params = tiny_params["decoder"]
    emb = jax.random.normal(jax.random.PRNGKey(5), (2, 4, tiny_cfg.gpt2.n_embd)) * 0.1
    dp = DecodeParams(max_new_tokens=6, num_beams=1, min_new_tokens=2, eos_id=127)
    base = np.asarray(generate(params, tiny_cfg.gpt2, emb, dp))
    pallas_cfg = dataclasses.replace(tiny_cfg.gpt2, use_pallas_decode=True)
    fused = np.asarray(generate(params, pallas_cfg, emb, dp))
    np.testing.assert_array_equal(base, fused)


def test_encoder_attention_matches_xla():
    from video_caption_tpu.ops.pallas import encoder_attention as ea

    n, nh, s, hd = 2, 4, 13, 64  # odd S like the 197-token ViT sequence
    h = nh * hd
    qkv = jax.random.normal(jax.random.PRNGKey(3), (n, s, 3 * h), jnp.float32)
    out = ea.encoder_attention(qkv, nh)
    assert out is not None and ea.last_backend == "pallas"

    r = qkv.reshape(n, s, 3, nh, hd)
    q = r[:, :, 0].transpose(0, 2, 1, 3)
    k = r[:, :, 1].transpose(0, 2, 1, 3)
    v = r[:, :, 2].transpose(0, 2, 1, 3)
    scale = hd ** -0.5
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32) * scale
    ref = jnp.einsum("nhqk,nhkd->nhqd", jax.nn.softmax(logits, -1).astype(q.dtype), v)
    ref = ref.transpose(0, 2, 1, 3).reshape(n, s, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_encoder_attention_bad_shape_falls_back():
    from video_caption_tpu.ops.pallas import encoder_attention as ea

    assert ea.encoder_attention(jnp.zeros((2, 13, 4 * 3 * 60)), 4) is None  # hd=60
    assert ea.last_backend == "xla-fallback"
    assert ea.encoder_attention(jnp.zeros((2, 4, 13, 64)), 4) is None  # ndim
    assert ea.encoder_attention(jnp.zeros((2, 13, 100)), 4) is None  # not div by 3*nh


def test_vit_encode_with_pallas_attention_matches(tiny_cfg, tiny_params):
    """Full encoder forward with the attention kernel must match the XLA
    path (the kernel computes identical math; on CPU it runs interpreted)."""
    import dataclasses

    from video_caption_tpu.models import vit as vt

    cfg = tiny_cfg.vit
    video = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 3, 32, 32))
    params = tiny_params["encoder"]
    base = np.asarray(vt.vit_encode(params, video, cfg))
    pallas_cfg = dataclasses.replace(cfg, use_pallas_attention=True)
    fused = np.asarray(vt.vit_encode(params, video, pallas_cfg))
    np.testing.assert_allclose(fused, base, rtol=2e-5, atol=2e-5)


def test_gpt2_decode_layer_kernel_matches(tiny_params, tiny_cfg):
    """Greedy + sampled decode through the fused whole-layer kernel must
    produce identical tokens to the stacked XLA path (interpret mode on CPU)."""
    import dataclasses

    from video_caption_tpu.decode.generate import DecodeParams, generate

    params = tiny_params["decoder"]
    emb = jax.random.normal(jax.random.PRNGKey(5), (2, 4, tiny_cfg.gpt2.n_embd)) * 0.1
    kcfg = dataclasses.replace(tiny_cfg.gpt2, use_pallas_decode_layer=True)
    for dp in (
        DecodeParams(max_new_tokens=6, num_beams=1, min_new_tokens=2, eos_id=127),
        DecodeParams(max_new_tokens=6, num_beams=1, temperature=0.9, top_p=0.9,
                     top_k=5, min_new_tokens=2, eos_id=127),
    ):
        rng = jax.random.PRNGKey(3)
        base = np.asarray(generate(params, tiny_cfg.gpt2, emb, dp, rng))
        fused = np.asarray(generate(params, kcfg, emb, dp, rng))
        np.testing.assert_array_equal(base, fused)


def test_encoder_attention_kernel_is_differentiable(tiny_cfg, tiny_params):
    """Joint-training path: grads through vit_encode with the attention
    kernel must match the XLA path (custom VJP recomputes the reference)."""
    import dataclasses

    from video_caption_tpu.models import vit as vt

    cfg = tiny_cfg.vit
    pallas_cfg = dataclasses.replace(cfg, use_pallas_attention=True)
    video = jax.random.normal(jax.random.PRNGKey(9), (2, 2, 3, 32, 32))
    params = tiny_params["encoder"]

    def loss(p, c):
        return jnp.sum(vt.vit_encode(p, video, c) ** 2)

    g_base = jax.grad(lambda p: loss(p, cfg))(params)
    g_fused = jax.grad(lambda p: loss(p, pallas_cfg))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        g_base, g_fused,
    )


def test_pool_and_projector_custom_vjp_math():
    """The mapper trainer differentiates through prefix_project (trainable
    mapper) and the frozen-ViT pool; both kernels now carry custom VJPs so
    the TPU training step keeps the Pallas forward. The backward formulas
    are verified here against autodiff of the plain ops (the kernels
    themselves are TPU-gated; the VJP rules are backend-independent)."""
    from video_caption_tpu.ops.pallas.fused_pool import _xla_pool
    from video_caption_tpu.ops.pallas.prefix_projector import _project_bwd

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(5, 256), jnp.float32)
    w = jnp.asarray(rng.randn(256, 512), jnp.float32)
    b = jnp.asarray(rng.randn(512), jnp.float32)
    g = jnp.asarray(rng.randn(5, 512), jnp.float32)
    _, vjp = jax.vjp(lambda x, w, b: x @ w + b, x, w, b)
    expect = vjp(g)
    got = _project_bwd((x, w), g)
    for e, a in zip(expect, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-3, atol=1e-4)

    t = jnp.asarray(rng.randn(8, 9, 128), jnp.float32)
    for mode in ("cls", "gap"):
        def ref_pool(t, m=mode):
            per = t[:, 0, :] if m == "cls" else jnp.mean(t[:, 1:, :], axis=1)
            return jnp.mean(per.reshape(2, 4, -1), axis=1)

        np.testing.assert_allclose(
            np.asarray(_xla_pool(t, 2, 4, mode)), np.asarray(ref_pool(t)),
            rtol=1e-6, atol=1e-6)
        g_ref = jax.grad(lambda t: jnp.sum(ref_pool(t) ** 2))(t)
        g_xla = jax.grad(lambda t: jnp.sum(jnp.sum(_xla_pool(t, 2, 4, mode) ** 2)))(t)
        np.testing.assert_allclose(np.asarray(g_xla), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)
