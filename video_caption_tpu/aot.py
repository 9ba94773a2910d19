"""Ahead-of-time compilation & serialized executables — the XLA analog of
the reference's reserved TensorRT path (core/trt/: build_engine, runtime,
export_onnx all NotImplementedError; rollout order "encoder first, projector
second, decoder last", core/trt/__init__.py:3-5).

- ``build_engine``: lowers + compiles the engine's stage programs AOT (same
  rollout order) and reports compile time + FLOP estimates per stage.
- ``export_stablehlo``: serializes a program via ``jax.export`` to disk —
  the portable-artifact analog of an ONNX export.
- ``AotRuntime``: loads serialized programs and executes them.

Plus the persistent XLA compilation cache (env.enable_compilation_cache)
which covers the common serve-restart case automatically.
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def _flops_of(lowered) -> Optional[float]:
    try:
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return None


def build_engine(config=None, stages: Tuple[str, ...] = ("encoder", "projector", "decoder")) -> Dict:
    """AOT-compile the pipeline stages in the reference's rollout order.
    Returns {stage: {compile_s, flops}}."""
    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import load_params, model_config_from_inference
    from video_caption_tpu.models import caption_model as cm
    from video_caption_tpu.models import gpt2 as g2
    from video_caption_tpu.ops.prefix_norm import apply_prefix_norm

    config = config or default_inference_config()
    mc = model_config_from_inference(config)
    params = load_params(config, mc)
    report: Dict[str, Dict] = {}

    video = jnp.zeros((1, config.num_frames, 3, config.image_size, config.image_size))
    emb = jnp.zeros((1, mc.video_dim))
    prefix = jnp.zeros((1, mc.prefix_len, mc.gpt2.n_embd))

    def compile_stage(name: str, fn: Callable, *args):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        report[name] = {
            "compile_s": round(time.perf_counter() - t0, 2),
            "flops": _flops_of(lowered),
        }
        log.info("AOT %s: %.1fs", name, report[name]["compile_s"])
        return compiled

    if "encoder" in stages:
        compile_stage("encoder", lambda p, v: cm.encode_video(p, v, mc), params, video)
    if "projector" in stages:
        compile_stage(
            "projector",
            lambda p, e: cm.map_prefix(p, apply_prefix_norm(e, mc.ln_scale, mc.in_weight), mc),
            params, emb,
        )
    if "decoder" in stages:
        from video_caption_tpu.decode.generate import DecodeParams, greedy_or_sample

        dp = DecodeParams(max_new_tokens=8, num_beams=1)
        embeds = jnp.zeros((1, mc.prefix_len + 1, mc.gpt2.n_embd))
        compile_stage(
            "decoder",
            lambda p, e: greedy_or_sample(p["decoder"], mc.gpt2, e, dp),
            params, embeds,
        )
    return report


def export_stablehlo(fn: Callable, args: Tuple, out_path: str) -> str:
    """Serialize a jitted program to portable bytes (jax.export) — the
    ONNX-export analog (core/trt/export_onnx.py raised NotImplementedError)."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*args)
    data = exported.serialize()
    path = Path(out_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    log.info("exported %d bytes of serialized StableHLO to %s", len(data), path)
    return str(path)


def export_request_program(engine, out_path: str) -> str:
    """Serialize the engine's fused single-video request program (the
    program served by the AOT request path, engine._aot_single_exec) to a
    portable StableHLO artifact — the "engine file" analog of the
    reference's reserved TRT build path (core/trt/build_engine.py:2).
    Reload via ``AotRuntime.load``/``run`` (compilation on load rides the
    persistent XLA compile cache)."""
    program, _, _ = engine._fused_infer_program()
    c = engine.config
    video = jnp.zeros((1, c.num_frames, 3, c.image_size, c.image_size), jnp.uint8)
    key = jax.random.PRNGKey(0)
    from jax import export as jexport

    exported = jexport.export(program)(engine.params, video, key)
    data = exported.serialize()
    path = Path(out_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    log.info("exported request program: %d bytes to %s", len(data), path)
    return str(path)


class AotRuntime:
    """Loads and runs serialized programs (core/trt/runtime.py analog)."""

    def __init__(self):
        self._programs: Dict[str, Any] = {}

    def load(self, name: str, path: str) -> None:
        from jax import export as jexport

        self._programs[name] = jexport.deserialize(Path(path).read_bytes())

    def run(self, name: str, *args):
        if name not in self._programs:
            raise KeyError(f"program {name!r} not loaded")
        return self._programs[name].call(*args)
