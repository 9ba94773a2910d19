"""Toy-model and align-model smoke tests (the reference's minimal-runnable-
model verification idea, SURVEY §4): shapes, loss decrease under training."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from video_caption_tpu.models import align as al
from video_caption_tpu.models import toy
from video_caption_tpu.models import vit as vt


def _batch(b=4, t=2, vocab=128, l=8, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(b, t, 3, 32, 32).astype(np.float32)),
        jnp.asarray(rng.randint(1, vocab - 1, (b, l)).astype(np.int32)),
        jnp.ones((b, l), jnp.int32),
    )


def test_simple_align_loss_decreases():
    cfg = toy.ToyConfig()
    params = toy.init_simple_align(jax.random.PRNGKey(0), cfg)
    video, ids, mask = _batch()
    loss_fn = lambda p: toy.simple_align_loss(p, video, ids, mask)  # noqa: E731
    opt = optax.adam(1e-2)
    state = opt.init(params)
    first = float(loss_fn(params))
    step = jax.jit(lambda p, s: _update(p, s, loss_fn, opt))
    for _ in range(20):
        params, state = step(params, state)
    assert float(loss_fn(params)) < first


def _update(p, s, loss_fn, opt):
    g = jax.grad(loss_fn)(p)
    u, s = opt.update(g, s, p)
    return optax.apply_updates(p, u), s


def test_simple_vc_and_tiny_captioner_shapes():
    cfg = toy.ToyConfig(max_len=8)
    video, ids, _ = _batch(l=8)
    p1 = toy.init_simple_vc(jax.random.PRNGKey(0), cfg)
    logits = toy.simple_vc_logits(p1, video, cfg)
    assert logits.shape == (4, 8, cfg.vocab_size)
    p2 = toy.init_tiny_captioner(jax.random.PRNGKey(1), cfg)
    logits2 = toy.tiny_captioner_logits(p2, video, ids, cfg)
    assert logits2.shape == (4, 8, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits2)).all()


def test_align_model_encoders_normalized():
    cfg = al.AlignConfig(
        vit=vt.ViTConfig(image_size=32, patch_size=16, embed_dim=64, depth=2,
                         num_heads=4, out_dim=16, dtype=jnp.float32),
        vocab_size=128, text_dim=64, text_heads=4, embed_dim=32,
    )
    params = al.init_align_params(jax.random.PRNGKey(0), cfg)
    video, ids, mask = _batch()
    v = al.encode_video(params, video, cfg)
    t = al.encode_text(params, ids, mask, cfg)
    assert v.shape == (4, 32) and t.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(t), axis=-1), 1.0, rtol=1e-5)


def test_cosine_embedding_loss_matches_torch_semantics():
    v = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    t = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    pos = al.cosine_embedding_loss(v, t, jnp.asarray([1.0, 1.0]))
    np.testing.assert_allclose(float(pos), 0.5, atol=1e-6)  # (0 + 1)/2
    neg = al.cosine_embedding_loss(v, t, jnp.asarray([-1.0, -1.0]))
    np.testing.assert_allclose(float(neg), 0.5, atol=1e-6)  # (max(0,1)+max(0,0))/2
