"""Left-padded multi-prompt batching must be observation-equivalent to
decoding each prompt alone (the engine's grouped-preset optimization)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_caption_tpu.decode.generate import DecodeParams, generate
from video_caption_tpu.models import caption_model as cm
from video_caption_tpu.models import gpt2 as g2


@pytest.fixture(scope="module")
def decoder(tiny_cfg, tiny_params):
    return tiny_params["decoder"], tiny_cfg.gpt2


def _single(decoder_params, gcfg, embeds, dp):
    return np.asarray(generate(decoder_params, gcfg, embeds, dp))


@pytest.mark.parametrize("beams", [1, 3])
def test_padded_batch_matches_individual(decoder, beams):
    params, gcfg = decoder
    rng = np.random.RandomState(0)
    h = gcfg.n_embd
    short = jnp.asarray(rng.randn(1, 3, h).astype(np.float32) * 0.1)
    long = jnp.asarray(rng.randn(1, 6, h).astype(np.float32) * 0.1)
    dp = DecodeParams(max_new_tokens=8, num_beams=beams, temperature=1.0, top_p=1.0,
                      no_repeat_ngram_size=3, repetition_penalty=1.1,
                      min_new_tokens=2, eos_id=127)

    ref_short = _single(params, gcfg, short, dp)
    ref_long = _single(params, gcfg, long, dp)

    # left-pad the short row to length 6 with junk embeds + mask
    pad = jnp.asarray(rng.randn(1, 3, h).astype(np.float32))
    padded_short = jnp.concatenate([pad, short], axis=1)
    batch = jnp.concatenate([padded_short, long], axis=0)
    mask = jnp.asarray([[0, 0, 0, 1, 1, 1], [1, 1, 1, 1, 1, 1]], jnp.int32)
    out = np.asarray(generate(params, gcfg, batch, dp, prefill_mask=mask))

    np.testing.assert_array_equal(out[0], ref_short[0])
    np.testing.assert_array_equal(out[1], ref_long[0])


def test_engine_grouping_produces_three_texts(tiny_cfg, tiny_params):
    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import InferenceEngine

    class TinyTok:
        eos_token_id = 127
        bos_token_id = 127
        pad_token_id = 127
        vocab_size = 128

        def encode(self, text):
            return [b % 127 for b in text.encode()] or [127]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids if int(i) != 127)

    cfg = default_inference_config(ckpt="missing.pt", num_frames=2, image_size=32)
    engine = InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)
    engine.tokenizer = TinyTok()
    video = jnp.asarray(np.random.RandomState(0).randn(1, 2, 3, 32, 32).astype(np.float32))
    prefix = engine.compute_prefix(video)
    texts = engine.generate_presets(prefix, [
        ("precise", ""), ("precise", "State the action:"), ("natural", "Caption:"),
    ])
    assert len(texts) == 3
    assert all(isinstance(t, str) for t in texts)


def test_infer_batch_matches_single(tiny_cfg, tiny_params, tmp_path):
    """Batched multi-video inference must equal per-video inference for
    deterministic (beam) presets."""
    import dataclasses

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

    rng = np.random.RandomState(0)
    dirs = []
    for v in range(3):
        d = tmp_path / f"vid{v}"
        d.mkdir()
        for i in range(4):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                d / f"frame_{i:05d}.jpg"
            )
        dirs.append(str(d))

    cfg = default_inference_config(
        ckpt="missing.pt", num_frames=2, image_size=32,
        preset1="precise", preset2="precise", preset3="precise",
        prompt3="Another prompt:",
    )
    engine = InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)
    engine.tokenizer = TinyTok()

    batched = engine.infer_batch(dirs)
    singles = [engine.infer(d) for d in dirs]
    for b, s in zip(batched, singles):
        assert b.to_api_dict() == s.to_api_dict()


@pytest.mark.parametrize("beams", [1, 3])
def test_early_stop_matches_scan(decoder, beams):
    """early_stop while_loop and the scan loop must emit identical tokens."""
    import dataclasses

    params, gcfg = decoder
    rng = np.random.RandomState(3)
    emb = jnp.asarray(rng.randn(2, 4, gcfg.n_embd).astype(np.float32) * 0.1)
    dp = DecodeParams(max_new_tokens=8, num_beams=beams, min_new_tokens=2, eos_id=127)
    base = np.asarray(generate(params, gcfg, emb, dp))
    es = np.asarray(generate(params, gcfg, emb, dataclasses.replace(dp, early_stop=True)))
    np.testing.assert_array_equal(base, es)


def test_fused_and_unfused_dispatch_match(tiny_cfg, tiny_params, tmp_path):
    """The fused single-program request path and the async per-group path
    must produce identical captions for deterministic presets."""
    import dataclasses

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

    d = tmp_path / "f"
    d.mkdir()
    rng = np.random.RandomState(7)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            d / f"frame_{i:05d}.jpg"
        )

    base = default_inference_config(
        ckpt="missing.pt", num_frames=2, image_size=32,
        preset1="precise", preset2="precise", preset3="precise",
        prompt3="Another:",
    )
    outs = {}
    for fused in (False, True):
        cfg = dataclasses.replace(base, compile=dataclasses.replace(
            base.compile, fuse_request_program=fused))
        eng = InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)
        eng.tokenizer = TinyTok()
        outs[fused] = eng.infer(str(d)).to_api_dict()
    assert outs[True] == outs[False]
