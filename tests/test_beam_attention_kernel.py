"""Beam gen-attention kernel (ops/pallas/beam_attention.py) vs the XLA
_beam_attend path — interpret mode on CPU, plus end-to-end beam decode
token parity with the kernel forced on."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from video_caption_tpu.models import gpt2 as g2
from video_caption_tpu.ops.pallas import beam_attention as ba


def _case(b=8, k=3, nh=4, hd=32, s0=12, n=6, t_val=3, seed=0):
    rng = np.random.RandomState(seed)
    h = nh * hd
    r = b * k
    cfg = g2.GPT2Config(vocab_size=128, n_embd=h, n_layer=2, n_head=nh,
                        dtype=jnp.float32)
    q = jnp.asarray(rng.randn(r, h).astype(np.float32))
    gkv = jnp.asarray(rng.randn(2, n, 2, r, h).astype(np.float32))
    pk = jnp.asarray(rng.randn(2, b, s0, h).astype(np.float32))
    pv = jnp.asarray(rng.randn(2, b, s0, h).astype(np.float32))
    valid = jnp.asarray((rng.rand(b, s0) > 0.3).astype(np.int32))
    valid = valid.at[:, -1].set(1)
    # random but self-consistent ancestry: every column points to a row of
    # the same video
    anc = rng.randint(0, k, (r, n)).astype(np.int32)
    anc = (np.arange(r)[:, None] // k * k + anc).astype(np.int32)
    anc = jnp.asarray(anc)
    t = jnp.int32(t_val)
    return cfg, q, gkv, pk, pv, valid, anc, t


@pytest.mark.parametrize("layer", [0, 1])
def test_kernel_matches_xla_attend(layer):
    cfg, q, gkv, pk, pv, valid, anc, t = _case()
    k = 3
    hmask = g2.head_block_mask(cfg)
    sel = g2.ancestry_mask(anc, valid.shape[0], k, t)
    ref = g2._beam_attend(q, pk[layer], pv[layer], gkv[layer, :, 0],
                          gkv[layer, :, 1], valid, sel, hmask, k, cfg)
    with pltpu.force_tpu_interpret_mode():
        out = ba.beam_gen_attention(q, gkv, pk, pv, valid, anc, t,
                                    hmask.astype(q.dtype), layer, k, cfg.n_head)
    assert out is not None, ba.last_error
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_beam_decode_tokens_match_xla_path():
    """Full beam_search: kernel-forced (interpret) vs kernel-off tokens."""
    from video_caption_tpu.decode.generate import DecodeParams, generate

    cfg_on = g2.GPT2Config(vocab_size=256, n_embd=64, n_layer=2, n_head=2,
                           dtype=jnp.float32, use_pallas_beam_attention=True)
    cfg_off = dataclasses.replace(cfg_on, use_pallas_beam_attention=False)
    params = g2.init_gpt2_params(jax.random.PRNGKey(0), cfg_on)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 64))
    dp = DecodeParams(max_new_tokens=8, num_beams=2, min_new_tokens=2,
                      eos_id=255)
    ids_off = generate(params, cfg_off, embeds, dp)
    with pltpu.force_tpu_interpret_mode():
        ids_on = generate(params, cfg_on, embeds, dp)
    np.testing.assert_array_equal(np.asarray(ids_on), np.asarray(ids_off))


def test_kernel_exact_past_row_256():
    """Regression: ancestry row indices > 256 must survive the kernel's
    one-hot expansion. On real TPUs Mosaic's f32 dot multiplies in
    bf16-mantissa passes, so a direct integer one-hot contraction rounds
    values > 256 (production bug at bs=64 / R=384, found 2026-08-18: rows
    past 256 attended the wrong ancestors, max_abs 1.1 vs XLA). The kernel
    now splits indices into hi/lo < 128 components. Interpret mode can't
    reproduce the rounding itself, but this pins the hi/lo recombination
    and block-offset arithmetic at a production-scale row count (R=288,
    several grid blocks in)."""
    cfg, q, gkv, pk, pv, valid, anc, t = _case(b=96, k=3, nh=2, hd=64,
                                               s0=8, n=4, t_val=2, seed=3)
    # make some ancestries point at the highest rows of their video so the
    # >256 global indices are load-bearing
    anc_np = np.array(anc)
    anc_np[:, 1] = (np.arange(anc_np.shape[0]) // 3) * 3 + 2
    anc = jnp.asarray(anc_np)
    hmask = g2.head_block_mask(cfg)
    sel = g2.ancestry_mask(anc, 96, 3, t)
    ref = g2._beam_attend(q, pk[0], pv[0], gkv[0, :, 0], gkv[0, :, 1],
                          valid, sel, hmask, 3, cfg)
    with pltpu.force_tpu_interpret_mode():
        out = ba.beam_gen_attention(q, gkv, pk, pv, valid, anc, t,
                                    hmask.astype(q.dtype), 0, 3, 2)
    assert out is not None, ba.last_error
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fallback_off_tpu():
    cfg, q, gkv, pk, pv, valid, anc, t = _case()
    hmask = g2.head_block_mask(cfg)
    out = ba.beam_gen_attention(q, gkv, pk, pv, valid, anc, t,
                                hmask.astype(q.dtype), 0, 3, cfg.n_head)
    assert out is None   # CPU backend without interpret mode -> XLA path
