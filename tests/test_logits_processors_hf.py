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


def test_top_p_cap_boundary_vs_full_sort_oracle():
    """Pin behavior of the bounded nucleus at/above the cap (VERDICT r1 #10).

    Within the cap the bounded algorithm must EQUAL the full-sort oracle
    (cap >= vocab); beyond the cap it keeps a subset (the documented
    truncation deviation) and never keeps anything the oracle drops' complement
    incorrectly — i.e. kept set is exactly the oracle's top-cap intersection.
    """
    rng = np.random.RandomState(7)
    v = 512
    # flat-ish distribution so the 0.99 nucleus spans hundreds of tokens
    logits = (rng.standard_normal((4, v)) * 0.01).astype(np.float32)
    jl = jnp.asarray(logits)

    oracle = np.asarray(lp.apply_top_p(jl, 0.99, nucleus_cap=v))      # exact
    kept_oracle = ~np.isinf(oracle)
    assert kept_oracle.sum(axis=1).min() > 64  # nucleus genuinely exceeds cap

    # cap >= nucleus: identical to the oracle
    wide = np.asarray(lp.apply_top_p(jl, 0.99, nucleus_cap=v + 128))
    np.testing.assert_array_equal(np.isinf(wide), np.isinf(oracle))

    # cap < nucleus: kept set == oracle's kept set truncated to the top-cap
    cap = 64
    bounded = np.asarray(lp.apply_top_p(jl, 0.99, nucleus_cap=cap))
    kept_bounded = ~np.isinf(bounded)
    assert kept_bounded.sum(axis=1).max() <= cap
    # every kept token is in the oracle's nucleus AND within the top-cap logits
    for row in range(4):
        order = np.argsort(-logits[row], kind="stable")
        top_cap = set(order[:cap].tolist())
        kb = set(np.nonzero(kept_bounded[row])[0].tolist())
        ko = set(np.nonzero(kept_oracle[row])[0].tolist())
        assert kb <= ko and kb <= top_cap
        # kept values pass through unchanged
        np.testing.assert_allclose(bounded[row][kept_bounded[row]],
                                   logits[row][kept_bounded[row]])


def test_top_p_trained_like_distribution_exact_within_cap():
    """Peaky (trained-LM-like) logits: nucleus is small, bounded == oracle."""
    rng = np.random.RandomState(3)
    v = 2048
    logits = rng.standard_normal((2, v)).astype(np.float32)
    logits[:, :8] += 12.0  # sharp head: nucleus fits easily within 64
    jl = jnp.asarray(logits)
    oracle = np.asarray(lp.apply_top_p(jl, 0.9, nucleus_cap=v))
    bounded = np.asarray(lp.apply_top_p(jl, 0.9, nucleus_cap=64))
    np.testing.assert_array_equal(np.isinf(bounded), np.isinf(oracle))


def test_fused_top_k_top_p_equals_sequential_and_hf():
    """apply_top_k_top_p must EXACTLY equal TopK(k) then TopP(p) — both our
    sequential ops (cap >= vocab, exact mode) and HF's warper chain."""
    from transformers import TopKLogitsWarper, TopPLogitsWarper

    rng = np.random.RandomState(11)
    v = 512
    logits = rng.standard_normal((5, v)).astype(np.float32) * 2.0
    jl = jnp.asarray(logits)

    fused = np.asarray(lp.apply_top_k_top_p(jl, 50, 0.9))
    seq = np.asarray(lp.apply_top_p(lp.apply_top_k(jl, 50), 0.9, nucleus_cap=v))
    np.testing.assert_array_equal(np.isinf(fused), np.isinf(seq))
    kept = ~np.isinf(seq)
    np.testing.assert_allclose(fused[kept], seq[kept])

    t = torch.tensor(logits)
    hf = TopPLogitsWarper(0.9)(None, TopKLogitsWarper(50)(None, t)).numpy()
    np.testing.assert_array_equal(np.isinf(fused), np.isinf(hf))
    np.testing.assert_allclose(fused[kept], hf[kept], rtol=1e-6)

    # degenerate modes route to the single warpers
    only_k = np.asarray(lp.apply_top_k_top_p(jl, 50, 1.0))
    np.testing.assert_array_equal(only_k, np.asarray(lp.apply_top_k(jl, 50)))
    only_p = np.asarray(lp.apply_top_k_top_p(jl, 0, 0.9))
    np.testing.assert_array_equal(only_p, np.asarray(lp.apply_top_p(jl, 0.9)))


def test_sample_top_k_top_p_distribution_exact():
    """k-way shortcut sampling must match the distribution of a full-vocab
    categorical over the TopK->TopP-filtered logits (histogram over draws)."""
    import jax

    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32) * 2.0)
    filtered = lp.apply_top_p(lp.apply_top_k(logits, 8), 0.9, nucleus_cap=64)
    probs_ref = np.asarray(jax.nn.softmax(filtered, axis=-1))[0]

    draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), draws)
    toks = np.asarray(
        jax.vmap(lambda k: lp.sample_top_k_top_p(k, logits, 8, 0.9)[0])(keys)
    )
    hist = np.bincount(toks, minlength=64) / draws
    # zero-probability tokens never drawn; kept tokens near reference probs
    assert np.all(hist[probs_ref == 0] == 0)
    np.testing.assert_allclose(hist[probs_ref > 0], probs_ref[probs_ref > 0], atol=0.04)


def test_topk_processed_matches_full_chain_oracle():
    """Candidate-set top-k (no [B,V] scatters) must equal top-k of the
    full-vocab processor chain for penalty>=1 at every step index."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from video_caption_tpu.decode import logits_process as lp

    b, v, n = 4, 257, 10
    key = jax.random.PRNGKey(11)
    gen = jax.random.randint(jax.random.PRNGKey(12), (b, n), 0, v, jnp.int32)
    for t_val in (0, 1, 3, 7, 9):
        scores = jax.random.normal(jax.random.fold_in(key, t_val), (b, v), jnp.float32)
        t = jnp.int32(t_val)
        oracle = lp.apply_repetition_penalty(scores, gen, t, 1.1)
        oracle = lp.apply_no_repeat_ngram(oracle, gen, t, 3)
        oracle = lp.apply_min_new_tokens(oracle, t, 5, eos_id=7)
        ov, oi = jax.lax.top_k(oracle, 6)
        fv, fi = lp.topk_processed(scores, gen, t, 6, 1.1, 3, 5, 7)
        np.testing.assert_allclose(np.asarray(fv), np.asarray(ov), rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(oi))


def test_generate_candidate_vs_scatter_paths_identical(tiny_params, tiny_cfg):
    """Beam + sampled decodes produce identical tokens through the
    candidate-set path and the full-vocab scatter path."""
    import jax
    import numpy as np
    from video_caption_tpu.decode import generate as gen_mod
    from video_caption_tpu.decode.generate import DecodeParams, generate

    params = tiny_params["decoder"]
    emb = jax.random.normal(jax.random.PRNGKey(5), (2, 4, tiny_cfg.gpt2.n_embd)) * 0.1
    cases = [
        DecodeParams(max_new_tokens=8, num_beams=3, min_new_tokens=2, eos_id=127),
        DecodeParams(max_new_tokens=8, num_beams=1, temperature=0.9, top_p=0.9,
                     top_k=5, min_new_tokens=2, eos_id=127),
        DecodeParams(max_new_tokens=8, num_beams=1, min_new_tokens=2, eos_id=127),
    ]
    for dp in cases:
        rng = jax.random.PRNGKey(3)
        fast = np.asarray(generate(params, tiny_cfg.gpt2, emb, dp, rng))
        orig = gen_mod._candidate_path_ok
        gen_mod._candidate_path_ok = lambda _dp: False
        try:
            jax.clear_caches()  # drop the jitted fast-path program
            slow = np.asarray(generate(params, tiny_cfg.gpt2, emb, dp, rng))
        finally:
            gen_mod._candidate_path_ok = orig
            jax.clear_caches()
        np.testing.assert_array_equal(fast, slow)


class TestExactTopK:
    """exact_topk must return the exact top-k values AND indices of
    lax.top_k for every realistic input (ties among finite values may
    reorder — documented; all--inf tails are value-equivalent)."""

    def _check(self, scores, k, strict_idx=True):
        import jax
        import jax.numpy as jnp

        from video_caption_tpu.decode import logits_process as lp

        got_v, got_i = lp.exact_topk(jnp.asarray(scores), k)
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(scores), k)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
        if strict_idx:
            np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
        else:
            # indices must still point at the claimed values
            rows = np.arange(scores.shape[0])[:, None]
            np.testing.assert_array_equal(
                np.asarray(scores)[rows, np.asarray(got_i)], np.asarray(got_v))

    def test_random_large_vocab(self):
        rng = np.random.RandomState(0)
        s = rng.randn(7, 50257).astype(np.float32)
        for k in (1, 6, 31, 75):
            self._check(s, k)

    def test_adjacent_window_values(self):
        # top values packed into one window — the single-window case the
        # window-gather must still cover exactly
        s = np.full((3, 50257), -5.0, np.float32)
        s[:, 100:131] = np.linspace(10, 9, 31, dtype=np.float32)
        self._check(s, 31)

    def test_values_spread_across_windows(self):
        s = np.full((2, 50257), -5.0, np.float32)
        cols = np.arange(0, 31 * 977, 977)   # one top value per distant window
        s[:, cols] = np.linspace(10, 9, 31, dtype=np.float32)
        self._check(s, 31)

    def test_neg_inf_rows(self):
        s = np.full((2, 1000), -np.inf, np.float32)
        s[0, 5] = 1.0
        self._check(s, 4, strict_idx=False)   # -inf tail: indices may differ

    def test_k_ge_vocab(self):
        # k >= vocab degenerates to a full sort of the vocab
        import jax
        import jax.numpy as jnp

        from video_caption_tpu.decode import logits_process as lp

        rng = np.random.RandomState(1)
        s = rng.randn(3, 40).astype(np.float32)
        got_v, got_i = lp.exact_topk(jnp.asarray(s), 64)
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(s), 40)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))

    def test_duplicate_values_within_window(self):
        s = np.full((2, 4096), 0.0, np.float32)
        s[:, 10] = 3.0
        s[:, 11] = 3.0   # duplicate inside one window: index order preserved
        s[:, 70] = 2.0
        self._check(s, 3)

    def test_tail_window_overlap_duplicates(self):
        # large values packed into the clamped-gather overlap zone: the
        # tail window's duplicate view of the last full window must not
        # count a value twice (exactness guard for the tail handling)
        v = 50257   # 64-window tail of 17 ids
        s = np.full((2, v), -5.0, np.float32)
        s[:, v - 31: v] = np.linspace(10, 9, 31, dtype=np.float32)
        self._check(s, 31)
        # duplicates straddling the overlap must not displace value #31
        s3 = np.full((2, v), -5.0, np.float32)
        s3[:, v - 40: v] = np.linspace(10, 9.2, 40, dtype=np.float32)
        s3[:, 7] = 9.1   # the true 31st-or-so value lives far away
        self._check(s3, 41)
        s2 = np.full((2, v), -5.0, np.float32)
        s2[:, v - 17:] = 8.0          # tail ids tie
        s2[:, v - 40: v - 17] = 9.0   # overlap-zone values higher
        self._check(s2, 10, strict_idx=False)
