"""Token-for-token decode parity against HF transformers ``generate``.

This is the accuracy-alignment harness the reference reserved a slot for
(core/scripts/accuracy_alignment.py): a randomly-initialized torch
GPT2LMHeadModel is converted to our pytree, and our scan-based decode must
produce the exact token ids HF produces for the same ``inputs_embeds`` —
greedy and beam, with repetition penalty, no-repeat-ngram and min_new_tokens
active (the reference's exact generate kwargs, text_decoder.py:131-144).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from video_caption_tpu.decode.generate import DecodeParams, generate  # noqa: E402
from video_caption_tpu.models import gpt2 as g2  # noqa: E402
from video_caption_tpu.models.convert import convert_hf_gpt2  # noqa: E402

VOCAB = 128
EOS = VOCAB - 1


@pytest.fixture(scope="module")
def hf_and_jax():
    torch.manual_seed(0)
    hf_cfg = transformers.GPT2Config(
        vocab_size=VOCAB, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        bos_token_id=EOS, eos_token_id=EOS,
    )
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    state = hf.state_dict()
    params = {k: jnp.asarray(v) for k, v in convert_hf_gpt2(state, "", 2).items()
              if not isinstance(v, dict)}
    params["blocks"] = {k: jnp.asarray(v) for k, v in convert_hf_gpt2(state, "", 2)["blocks"].items()}
    cfg = g2.GPT2Config(
        vocab_size=VOCAB, max_position_embeddings=64, n_embd=64, n_layer=2,
        n_head=4, dtype=jnp.float32,
    )
    return hf, params, cfg


def _embeds(b=1, s=5, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randn(b, s, 64).astype(np.float32) * 0.1


def test_logits_parity(hf_and_jax):
    hf, params, cfg = hf_and_jax
    emb = _embeds(2, 5)
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.tensor(emb)).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(5), (2, 5)).astype(jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    ours = g2.gpt2_logits_nocache(params, jnp.asarray(emb), positions, mask, cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def _hf_generate(hf, emb, *, num_beams, max_new, min_new=2, rep=1.1, ngram=3):
    with torch.no_grad():
        out = hf.generate(
            inputs_embeds=torch.tensor(emb),
            attention_mask=torch.ones(emb.shape[:2], dtype=torch.long),
            max_new_tokens=max_new,
            min_new_tokens=min_new,
            num_beams=num_beams,
            do_sample=False,
            no_repeat_ngram_size=ngram,
            repetition_penalty=rep,
            pad_token_id=EOS,
            eos_token_id=EOS,
        )
    return out.numpy()


def _ours_generate(params, cfg, emb, *, num_beams, max_new, min_new=2, rep=1.1, ngram=3):
    dp = DecodeParams(
        max_new_tokens=max_new, num_beams=num_beams, temperature=1.0, top_p=1.0,
        no_repeat_ngram_size=ngram, repetition_penalty=rep,
        min_new_tokens=min_new, eos_id=EOS,
    )
    return np.asarray(generate(params, cfg, jnp.asarray(emb), dp))


def _trim(row):
    """Strip trailing EOS padding but keep one terminating EOS if present."""
    row = list(row)
    while row and row[-1] == EOS:
        row.pop()
    return row


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_greedy_parity(hf_and_jax, seed):
    hf, params, cfg = hf_and_jax
    emb = _embeds(1, 5, seed)
    ref = _hf_generate(hf, emb, num_beams=1, max_new=10)
    ours = _ours_generate(params, cfg, emb, num_beams=1, max_new=10)
    assert _trim(ref[0]) == _trim(ours[0]), f"ref={ref[0]} ours={ours[0]}"


@pytest.mark.parametrize("seed", [1, 2])
def test_greedy_parity_batched(hf_and_jax, seed):
    hf, params, cfg = hf_and_jax
    emb = _embeds(3, 4, seed)
    ref = _hf_generate(hf, emb, num_beams=1, max_new=8)
    ours = _ours_generate(params, cfg, emb, num_beams=1, max_new=8)
    for r, o in zip(ref, ours):
        assert _trim(r) == _trim(o)


@pytest.mark.parametrize("seed,beams", [(1, 3), (2, 3), (3, 4)])
def test_beam_parity(hf_and_jax, seed, beams):
    hf, params, cfg = hf_and_jax
    emb = _embeds(1, 5, seed)
    ref = _hf_generate(hf, emb, num_beams=beams, max_new=10)
    ours = _ours_generate(params, cfg, emb, num_beams=beams, max_new=10)
    assert _trim(ref[0]) == _trim(ours[0]), f"ref={ref[0]} ours={ours[0]}"


def test_sample_runs_and_respects_vocab(hf_and_jax):
    _, params, cfg = hf_and_jax
    emb = _embeds(2, 4)
    dp = DecodeParams(
        max_new_tokens=8, num_beams=1, temperature=0.8, top_p=0.9,
        no_repeat_ngram_size=3, repetition_penalty=1.1, min_new_tokens=2, eos_id=EOS,
    )
    out = np.asarray(generate(params, cfg, jnp.asarray(emb), dp, jax.random.PRNGKey(0)))
    assert out.shape == (2, 8)
    assert (out >= 0).all() and (out < VOCAB).all()


@pytest.mark.parametrize("do_sample", [False, True])
def test_split_vs_contiguous_sample_cache(hf_and_jax, do_sample):
    """GPT2Config.sample_split_cache (time-major merged-H gen cache, the
    beam layout ported to K=1 — VERDICT r3 #3) must produce the exact same
    tokens as the round-3 contiguous [L,B,max_len,2,nh,hd] path, greedy and
    sampled (same rng stream)."""
    import dataclasses

    _, params, cfg = hf_and_jax
    emb = jnp.asarray(_embeds(3, 4, seed=5))
    dp = DecodeParams(
        max_new_tokens=8, num_beams=1,
        temperature=0.8 if do_sample else 1.0,
        top_p=0.9 if do_sample else 1.0,
        no_repeat_ngram_size=3, repetition_penalty=1.1, min_new_tokens=2,
        eos_id=EOS,
    )
    key = jax.random.PRNGKey(3)
    split = np.asarray(generate(
        params, dataclasses.replace(cfg, sample_split_cache=True), emb, dp, key))
    contig = np.asarray(generate(
        params, dataclasses.replace(cfg, sample_split_cache=False), emb, dp, key))
    np.testing.assert_array_equal(split, contig)
