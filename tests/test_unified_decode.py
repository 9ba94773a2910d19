"""The unified mixed-policy decode (decode/unified.py) must be
token-identical to running each policy group as its own program — the
grouped path is the parity-proven baseline (HF + reference differentials),
so exact agreement transfers those proofs to the unified program."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_caption_tpu.decode.generate import DecodeParams, generate_prefixed
from video_caption_tpu.decode.unified import generate_unified


def _prompt_group(prompt_lists, pad_id=127):
    """Engine-style LEFT-padded (ids, mask) arrays for one policy group."""
    max_len = max(len(p) for p in prompt_lists)
    ids = np.full((len(prompt_lists), max_len), pad_id, np.int32)
    mask = np.zeros((len(prompt_lists), max_len), np.int32)
    for row, p in enumerate(prompt_lists):
        ids[row, max_len - len(p):] = p
        mask[row, max_len - len(p):] = 1
    return jnp.asarray(ids), jnp.asarray(mask)


def _grouped_reference(decoder, gcfg, prefix, prompts, dps, keys):
    """The engine's per-group path, verbatim (engine._dispatch_videos)."""
    v = prefix.shape[0]
    outs = []
    for (ids, mask), dp, key in zip(prompts, dps, keys):
        n_g = ids.shape[0]
        prefix_rows = jnp.repeat(prefix, n_g, axis=0)
        idsv = jnp.asarray(np.tile(np.asarray(ids), (v, 1)))
        maskv = jnp.asarray(np.tile(np.asarray(mask), (v, 1)))
        outs.append(np.asarray(generate_prefixed(
            decoder, gcfg, prefix_rows, idsv, maskv, dp, key)))
    return outs


@pytest.fixture(scope="module")
def setup(tiny_cfg, tiny_params):
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(rng.randn(3, 4, tiny_cfg.gpt2.n_embd).astype(np.float32) * 0.1)
    return tiny_params["decoder"], tiny_cfg.gpt2, prefix


def _run_both(setup, prompts, dps, seed=5):
    decoder, gcfg, prefix = setup
    keys = tuple(jax.random.fold_in(jax.random.PRNGKey(seed), g)
                 for g in range(len(dps)))
    uni = generate_unified(decoder, gcfg, prefix, prompts, dps, keys)
    ref = _grouped_reference(decoder, gcfg, prefix, prompts, dps, keys)
    assert len(uni) == len(ref)
    for g, (u, r) in enumerate(zip(uni, ref)):
        np.testing.assert_array_equal(
            np.asarray(u), r, err_msg=f"group {g} ({dps[g]}) diverged")


def test_beam_plus_sampled(setup):
    """The engine's core workload shape: one 2-slot beam group + one
    sampled group, equal horizons."""
    prompts = (
        _prompt_group([[3], [9, 11, 4]]),       # beam group, 2 presets
        _prompt_group([[20, 7]]),               # sampled group
    )
    dps = (
        DecodeParams(max_new_tokens=8, num_beams=3, min_new_tokens=2, eos_id=127),
        DecodeParams(max_new_tokens=8, num_beams=1, temperature=0.9, top_p=0.9,
                     top_k=50, min_new_tokens=2, eos_id=127),
    )
    _run_both(setup, prompts, dps)


def test_differing_horizons_and_beam_widths(setup):
    """The serving workload shape: beam=3 x 6 tokens, beam=2 x 10 tokens,
    sampled x 6 — groups freeze at their own horizon inside the shared
    scan."""
    prompts = (
        _prompt_group([[3]]),
        _prompt_group([[9, 11, 4]]),
        _prompt_group([[20, 7]]),
    )
    dps = (
        DecodeParams(max_new_tokens=6, num_beams=3, min_new_tokens=2, eos_id=127),
        DecodeParams(max_new_tokens=10, num_beams=2, min_new_tokens=2, eos_id=127),
        DecodeParams(max_new_tokens=6, num_beams=1, temperature=0.8, top_p=0.85,
                     top_k=50, min_new_tokens=2, eos_id=127),
    )
    _run_both(setup, prompts, dps)


def test_greedy_with_beam(setup):
    """Greedy rows (num_beams=1, T=1.0) ride the same K=1 path."""
    prompts = (
        _prompt_group([[5, 6]]),
        _prompt_group([[8]]),
    )
    dps = (
        DecodeParams(max_new_tokens=7, num_beams=1, min_new_tokens=2, eos_id=127),
        DecodeParams(max_new_tokens=7, num_beams=4, min_new_tokens=2, eos_id=127),
    )
    _run_both(setup, prompts, dps)


def test_single_video(setup):
    decoder, gcfg, prefix = setup
    prompts = (
        _prompt_group([[3], [9, 11, 4]]),
        _prompt_group([[20, 7]]),
    )
    dps = (
        DecodeParams(max_new_tokens=6, num_beams=2, min_new_tokens=2, eos_id=127),
        DecodeParams(max_new_tokens=6, num_beams=1, temperature=0.9, top_p=0.9,
                     top_k=50, min_new_tokens=2, eos_id=127),
    )
    _run_both((decoder, gcfg, prefix[:1]), prompts, dps)


def test_engine_unified_vs_grouped(tiny_cfg, tiny_params, tmp_path):
    """Full engine path: unified on vs off must produce identical captions
    (same seed drives identical per-group rng keys)."""
    from PIL import Image

    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import InferenceEngine

    class TinyTok:
        eos_token_id = 127
        bos_token_id = 127
        pad_token_id = 127
        vocab_size = 128

        def encode(self, text):
            return [b % 127 for b in text.encode()] or [1]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids if int(i) != 127)

    rng = np.random.RandomState(7)
    dirs = []
    for v in range(2):
        d = tmp_path / f"vid{v}"
        d.mkdir()
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                d / f"frame_{i:05d}.jpg")
        dirs.append(str(d))

    base = default_inference_config(ckpt="missing.pt", num_frames=2, image_size=32)
    outs = {}
    for unified in (False, True):
        cfg = dataclasses.replace(base, compile=dataclasses.replace(
            base.compile, unified_decode=unified))
        eng = InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)
        eng.tokenizer = TinyTok()
        outs[unified] = [r.to_api_dict() for r in eng.infer_batch(dirs)] + \
            [eng.infer(dirs[0]).to_api_dict()]
    assert outs[True] == outs[False]
