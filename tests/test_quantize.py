"""Weight-only int8 quantization: reconstruction error, forward deviation,
and the engine integration path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from video_caption_tpu.models import gpt2 as g2
from video_caption_tpu.models.quantize import (
    dequantize_weight,
    quantization_error,
    quantize_gpt2_blocks,
    quantize_weight,
)


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.05
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8 and qw["scale"].shape == (128,)
    back = dequantize_weight(qw, jnp.float32)
    # per-channel symmetric int8: error <= scale/2 per element
    per_chan_bound = np.asarray(qw["scale"]) / 2 + 1e-8
    err = np.abs(np.asarray(back) - np.asarray(w))
    assert (err <= per_chan_bound[None, :]).all()
    assert quantization_error(w) < 0.01


def test_quantized_forward_close_and_faster_repr(tiny_params, tiny_cfg):
    gcfg = tiny_cfg.gpt2
    dec = tiny_params["decoder"]
    qdec = quantize_gpt2_blocks(dec)
    assert "attn_w" not in qdec["blocks"] and "attn_w_q" in qdec["blocks"]
    assert qdec["blocks"]["attn_w_q"].dtype == jnp.int8

    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 5, gcfg.n_embd)) * 0.1
    positions = jnp.broadcast_to(jnp.arange(5), (2, 5)).astype(jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    ref = g2.gpt2_logits_nocache(dec, emb, positions, mask, gcfg)
    quant = g2.gpt2_logits_nocache(qdec, emb, positions, mask, gcfg)
    # int8 weights perturb logits but distributions must stay close
    rel = float(jnp.max(jnp.abs(quant - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 0.05, rel


def test_quantized_decode_runs(tiny_params, tiny_cfg):
    from video_caption_tpu.decode.generate import DecodeParams, generate

    qdec = quantize_gpt2_blocks(tiny_params["decoder"])
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 4, tiny_cfg.gpt2.n_embd)) * 0.1
    dp = DecodeParams(max_new_tokens=6, num_beams=3, min_new_tokens=2, eos_id=127)
    out = np.asarray(generate(qdec, tiny_cfg.gpt2, emb, dp))
    assert out.shape == (1, 6)
    assert (out >= 0).all() and (out < 128).all()


def test_engine_int8_flag(tiny_params, tiny_cfg, tmp_path):
    from PIL import Image

    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import InferenceEngine

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(d / f"frame_{i:05d}.jpg")

    cfg = default_inference_config(ckpt="missing.pt", num_frames=2, image_size=32)
    cfg = dataclasses.replace(cfg, compile=dataclasses.replace(
        cfg.compile, quantize_decoder_int8=True))
    engine = InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)

    class TinyTok:
        eos_token_id = 127
        bos_token_id = 127
        pad_token_id = 127
        vocab_size = 128

        def encode(self, text):
            return [b % 127 for b in text.encode()] or [1]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids if int(i) != 127)

    engine.tokenizer = TinyTok()
    assert "attn_w_q" in engine.params["decoder"]["blocks"]
    result = engine.infer(str(d))
    assert set(result.to_api_dict()) == {"S1", "S2", "S3", "BEST"}
