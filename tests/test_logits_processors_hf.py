"""Logits processors vs HF transformers implementations on random inputs —
unit-level parity beneath the integration decode tests."""
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from video_caption_tpu.decode import logits_process as lp  # noqa: E402

VOCAB = 64


def _rand_logits(b=2, seed=0):
    return np.random.RandomState(seed).randn(b, VOCAB).astype(np.float32)


def test_repetition_penalty_matches_hf():
    from transformers import RepetitionPenaltyLogitsProcessor

    logits = _rand_logits()
    generated = np.array([[3, 5, 3, 0, 0], [7, 8, 9, 0, 0]], np.int32)
    t = 3  # three tokens generated so far
    ours = np.asarray(lp.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(generated), jnp.int32(t), 1.3
    ))
    hf = RepetitionPenaltyLogitsProcessor(1.3)
    ref = hf(torch.tensor(generated[:, :t].astype(np.int64)), torch.tensor(logits)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_no_repeat_ngram_matches_hf():
    from transformers import NoRepeatNGramLogitsProcessor

    logits = _rand_logits(1, 1)
    # history: 1 2 9 1 2 -> next token completing (1,2,x) bans x=9
    generated = np.array([[1, 2, 9, 1, 2, 0, 0, 0]], np.int32)
    t = 5
    ours = np.asarray(lp.apply_no_repeat_ngram(
        jnp.asarray(logits), jnp.asarray(generated), jnp.int32(t), 3
    ))
    hf = NoRepeatNGramLogitsProcessor(3)
    ref = hf(torch.tensor(generated[:, :t].astype(np.int64)), torch.tensor(logits)).numpy()
    assert ours[0, 9] == -np.inf
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_top_p_matches_hf():
    from transformers import TopPLogitsWarper

    logits = _rand_logits(3, 2)
    ours = np.asarray(lp.apply_top_p(jnp.asarray(logits), 0.8))
    hf = TopPLogitsWarper(0.8)
    ref = hf(None, torch.tensor(logits)).numpy()
    # same keep/drop set
    np.testing.assert_array_equal(np.isinf(ours), np.isinf(ref))
    kept = ~np.isinf(ref)
    np.testing.assert_allclose(ours[kept], ref[kept], rtol=1e-6)


def test_min_new_tokens_bans_eos_until_threshold():
    logits = jnp.asarray(_rand_logits(1))
    banned = np.asarray(lp.apply_min_new_tokens(logits, jnp.int32(2), 5, eos_id=63))
    assert banned[0, 63] == -np.inf
    free = np.asarray(lp.apply_min_new_tokens(logits, jnp.int32(5), 5, eos_id=63))
    assert np.isfinite(free[0, 63])


def test_top_k_matches_hf():
    from transformers import TopKLogitsWarper

    logits = _rand_logits(3, 4)
    ours = np.asarray(lp.apply_top_k(jnp.asarray(logits), 5))
    hf = TopKLogitsWarper(5)(None, torch.tensor(logits)).numpy()
    np.testing.assert_array_equal(np.isinf(ours), np.isinf(hf))
    kept = ~np.isinf(hf)
    np.testing.assert_allclose(ours[kept], hf[kept], rtol=1e-6)
