"""AOT-compiled single-request path (VERDICT r2 #6): the engine serves
single-video requests through a pre-lowered/pre-compiled executable of the
fused request program (engine._aot_single_exec) — captions must be identical
to the jit path, and the export artifact must round-trip."""
import numpy as np
import pytest
from PIL import Image


def _frames(tmp_path, name, n=3, seed=0):
    d = tmp_path / name
    d.mkdir()
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            d / f"frame_{i:05d}.jpg"
        )
    return str(d)


def _make_engine(tiny_cfg, tiny_params, **over):
    import dataclasses

    from video_caption_tpu.config import CompileConfig, default_inference_config
    from video_caption_tpu.engine import InferenceEngine

    # pin the pixel request path: with overlap_single_upload on (default) a
    # cold request is served by the FEATS program (engine._dispatch_feats,
    # tested in test_overlap_upload.py) and _aot_single is never built
    over.setdefault("overlap_single_upload", False)
    cfg = default_inference_config(
        ckpt="missing.pt", num_frames=2, image_size=32,
        compile=dataclasses.replace(CompileConfig(), **over),
    )
    return InferenceEngine(cfg, params=tiny_params, model_cfg=tiny_cfg)


def test_aot_request_path_matches_jit(tmp_path, tiny_cfg, tiny_params):
    d = _frames(tmp_path, "vid")
    eng_aot = _make_engine(tiny_cfg, tiny_params, aot_request_program=True)
    eng_jit = _make_engine(tiny_cfg, tiny_params, aot_request_program=False)
    # same starting rng so sampled presets draw identically
    r_aot = eng_aot.infer(d).to_api_dict()
    r_jit = eng_jit.infer(d).to_api_dict()
    assert r_aot == r_jit
    # the AOT executable was actually built and served the request
    assert eng_aot._aot_single not in (None, False)
    assert getattr(eng_jit, "_aot_single", None) is None


def test_aot_build_failure_falls_back(tmp_path, tiny_cfg, tiny_params, monkeypatch):
    d = _frames(tmp_path, "vid2", seed=2)
    eng = _make_engine(tiny_cfg, tiny_params, aot_request_program=True)
    program, _, _ = eng._fused_infer_program()

    def boom(*a, **k):
        raise RuntimeError("no AOT on this backend")

    monkeypatch.setattr(type(program), "lower", boom, raising=False)
    r = eng.infer(d)   # jit path serves the request
    assert eng._aot_single is False
    assert r.best_text


def test_export_request_program_roundtrip(tmp_path, tiny_cfg, tiny_params):
    import jax

    from video_caption_tpu.aot import AotRuntime, export_request_program

    eng = _make_engine(tiny_cfg, tiny_params)
    path = export_request_program(eng, str(tmp_path / "request.shlo"))
    rt = AotRuntime()
    rt.load("request", path)
    video = np.zeros((1, 2, 3, 32, 32), np.uint8)
    outs = rt.run("request", eng.params, video, jax.random.PRNGKey(0))
    program, group_list, _ = eng._fused_infer_program()
    ref = program(eng.params, video, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(outs), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
