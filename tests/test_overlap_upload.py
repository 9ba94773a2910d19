"""Overlapped single-request upload (CompileConfig.overlap_single_upload):
the cold path encodes each uploaded chunk of frames while the next chunk is
on the wire. Captions must be identical to the whole-video program — the
per-frame trunk math has no cross-frame reductions (vit.vit_encode_frames)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from video_caption_tpu.models import caption_model as cm
from video_caption_tpu.models import vit as vt


def _frames(tmp_path, name, n=6, seed=0):
    d = tmp_path / name
    d.mkdir()
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            d / f"frame_{i:05d}.jpg"
        )
    return str(d)


def test_encode_frames_matches_vit_encode(tiny_cfg, tiny_params):
    """vit_finish(vit_encode_frames(chunks)) == vit_encode(video), even when
    the frames arrive in uneven chunks."""
    rng = np.random.RandomState(1)
    video = jnp.asarray(rng.randint(0, 255, (2, 4, 3, 32, 32), np.uint8))
    full = vt.vit_encode(tiny_params["encoder"], video, tiny_cfg.vit)
    frames = video.reshape(8, 3, 32, 32)
    feats = jnp.concatenate([
        vt.vit_encode_frames(tiny_params["encoder"], frames[:3], tiny_cfg.vit),
        vt.vit_encode_frames(tiny_params["encoder"], frames[3:], tiny_cfg.vit),
    ])
    out = vt.vit_finish(tiny_params["encoder"], feats.reshape(2, 4, -1), tiny_cfg.vit)
    np.testing.assert_allclose(np.asarray(full), np.asarray(out), rtol=2e-6, atol=2e-6)


def test_frames_to_prefix_matches_video_to_prefix(tiny_cfg, tiny_params):
    rng = np.random.RandomState(2)
    video = jnp.asarray(rng.randint(0, 255, (1, 4, 3, 32, 32), np.uint8))
    want = cm.video_to_prefix(tiny_params, video, tiny_cfg)
    feats = cm.encode_frames(tiny_params, video[0], tiny_cfg)[None]
    got = cm.frames_to_prefix(tiny_params, feats, tiny_cfg)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=2e-6, atol=2e-6)


@pytest.fixture()
def make_engine(tiny_cfg, tiny_params):
    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import InferenceEngine

    def build(**compile_overrides):
        cfg = default_inference_config(ckpt="missing.pt", num_frames=4, image_size=32)
        cfg = dataclasses.replace(
            cfg, compile=dataclasses.replace(cfg.compile, **compile_overrides))
        return InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg, seed=7)

    return build


def test_overlapped_request_token_parity(make_engine, tmp_path):
    """infer() with the overlapped cold path on vs off: identical captions
    (cold AND warm repeat), and the overlapped request still fills the
    device video cache."""
    d = _frames(tmp_path, "v0")
    plain = make_engine(overlap_single_upload=False)
    over = make_engine(overlap_single_upload=True)
    want_cold = plain.infer(d).to_api_dict()
    got_cold = over.infer(d).to_api_dict()
    assert got_cold == want_cold
    assert len(over._video_cache) == 1, "overlapped load must fill the video cache"
    # warm repeat rides the pixel program off the cache — still matches the
    # plain engine (NOT the cold result: the sampled preset's rng advances
    # between requests, so S3 legitimately differs cold vs warm)
    want_warm = plain.infer(d).to_api_dict()
    got_warm = over.infer(d).to_api_dict()
    assert got_warm == want_warm
    assert got_warm["S1"] == want_cold["S1"]   # beam presets are rng-free


def test_overlapped_path_engages(make_engine, tmp_path, monkeypatch):
    """The overlapped path actually runs on a cold cls-pool request (guard
    against a silent permanent fallback)."""
    d = _frames(tmp_path, "v1", seed=3)
    eng = make_engine(overlap_single_upload=True)
    calls = []
    orig = eng._dispatch_feats

    def spy(feats):
        calls.append(feats.shape)
        return orig(feats)

    monkeypatch.setattr(eng, "_dispatch_feats", spy)
    eng.infer(d)
    assert calls and calls[0] == (1, 4, eng.model_cfg.vit.embed_dim)
    # the feats request program was AOT-compiled and served the request
    # (aot_request_program defaults on; the pixel-path twin is asserted in
    # test_aot_request_path.py with overlap off)
    assert getattr(eng, "_aot_feats", None) not in (None, False)
    # second request: cache hit -> pixel program, no new feats dispatch
    eng.infer(d)
    assert len(calls) == 1
