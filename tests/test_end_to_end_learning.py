"""End-to-end learning proof: the full training stack (compute_loss ->
optimizer -> checkpoint) overfits a tiny caption model on two synthetic
videos, and the full serving stack (engine -> scan decode -> tokenizer ->
cleaner) then reproduces the memorized captions from the saved checkpoint —
training and serving close the loop through the same pipeline a real MSVD
run would use."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from PIL import Image

from video_caption_tpu.models import caption_model as cm


class WordTok:
    """Tiny word-level tokenizer (vocab baked from the test captions)."""

    words = ["<eos>", "a", "red", "blue", "dog", "cat", "runs", "sits"]
    eos_token_id = 0
    bos_token_id = 0
    pad_token_id = 0
    vocab_size = 128

    def encode(self, text):
        return [self.words.index(w) for w in text.lower().split() if w in self.words] or [1]

    def decode(self, ids, skip_special_tokens=True):
        out = [self.words[int(i)] for i in ids if 0 < int(i) < len(self.words)]
        return " ".join(out)


@pytest.fixture(scope="module")
def learned_setup(tiny_cfg, tmp_path_factory):
    root = tmp_path_factory.mktemp("learn")
    rng = np.random.RandomState(0)
    # two visually distinct "videos": bright red frames vs bright blue frames
    captions = {"red": "a red dog runs", "blue": "a blue cat sits"}
    dirs = {}
    for name, chan in (("red", 0), ("blue", 2)):
        d = root / name
        d.mkdir()
        for i in range(3):
            img = np.zeros((32, 32, 3), np.uint8)
            img[..., chan] = 200 + rng.randint(0, 55, (32, 32))
            Image.fromarray(img).save(d / f"frame_{i:05d}.jpg")
        dirs[name] = str(d)

    tok = WordTok()
    cfg = dataclasses.replace(tiny_cfg)
    params = cm.init_caption_model(jax.random.PRNGKey(3), cfg)

    from video_caption_tpu.preprocessing.frame_loader import load_video_array

    videos = jnp.concatenate([
        jnp.asarray(load_video_array(dirs[n], num_frames=2, image_size=32))
        for n in ("red", "blue")
    ])
    # layout matches the engine's empty-prompt inference: [prefix, BOS, caption, EOS]
    L = 7
    ids, mask = [], []
    for n in ("red", "blue"):
        t = [tok.bos_token_id] + tok.encode(captions[n]) + [tok.eos_token_id]
        pad = L - len(t)
        ids.append(t + [0] * pad)
        mask.append([1] * len(t) + [0] * pad)
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.asarray(mask, jnp.int32)

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda q: cm.compute_loss(q, videos, ids, mask, cfg)
        )(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    loss = None
    for _ in range(300):
        params, state, loss = step(params, state)
    return cfg, params, tok, dirs, captions, float(loss)


def test_training_converges(learned_setup):
    *_, loss = learned_setup
    assert loss < 0.05, f"did not memorize, loss={loss}"


def test_engine_serves_memorized_captions(learned_setup, tmp_path):
    cfg, params, tok, dirs, captions, _ = learned_setup
    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import InferenceEngine
    from video_caption_tpu.training.checkpoint import save_checkpoint

    # serve from a SAVED checkpoint to cover the persistence hop too
    ckpt = str(tmp_path / "learned_ckpt")
    save_checkpoint(ckpt, params, step=300, best_val=0.0)

    inf_cfg = default_inference_config(
        ckpt=ckpt, num_frames=2, image_size=32,
        ln_scale=cfg.ln_scale, in_weight=cfg.in_weight,
    )
    engine = InferenceEngine(inf_cfg, model_cfg=cfg)
    engine.tokenizer = tok

    for name in ("red", "blue"):
        video = engine._load_video_to_device(dirs[name])
        prefix = engine.compute_prefix(video)
        text = engine.generate_once(prefix, "", num_beams=1, temperature=1.0,
                                    max_new_tokens=6, min_new_tokens=1,
                                    repetition_penalty=1.0, no_repeat_ngram_size=0)
        got = text.lower().rstrip(".")
        assert got == captions[name], f"{name}: got {got!r} want {captions[name]!r}"
