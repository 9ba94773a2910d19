"""Stateless core inference engine: frames_dir -> three candidate captions ->
best-of-3 (reference: core/engine.py:20-83).

The engine owns model execution and tensor flow only — it knows nothing of
FastAPI, HTTP, sessions, or UI (same layering rule as core/engine.py:23-25).

TPU-first improvements over the reference pipeline:

- the ViT encoder runs ONCE per request; the reference re-encodes the video
  for every preset (core/engine.py:40-42 inside a 3x loop) — the visual
  prefix is preset-independent, so we compute it a single time,
- each (preset, prompt-length) pair is a separately compiled XLA program,
  cached on the engine; first call compiles, every later call replays,
- decode runs as a fixed-shape scan with a static KV cache — no per-token
  Python, no dynamic shapes, no recompilation between requests.
"""
from __future__ import annotations

import logging
import time
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_caption_tpu.config import InferenceConfig
from video_caption_tpu.datatypes import CaptionCandidates, InferenceResult
from video_caption_tpu.decode.generate import DecodeParams, generate
from video_caption_tpu.decode.presets import preset_to_kwargs
from video_caption_tpu.decode.tokenizer import get_tokenizer
from video_caption_tpu.env import assert_core_runtime_ready, enable_compilation_cache
from video_caption_tpu.memory import MemoryManager
from video_caption_tpu.models import caption_model as cm
from video_caption_tpu.models import gpt2 as g2
from video_caption_tpu.models import vit as vt
from video_caption_tpu.postprocessing.candidate_ranker import select_best
from video_caption_tpu.postprocessing.text_cleaner import clean_text
from video_caption_tpu.preprocessing.frame_loader import load_video_array

log = logging.getLogger(__name__)


def model_config_from_inference(config: InferenceConfig) -> cm.CaptionModelConfig:
    dtype = jnp.bfloat16 if config.compile.dtype == "bfloat16" else jnp.float32
    return cm.CaptionModelConfig(
        vit=vt.ViTConfig(
            image_size=config.image_size,
            dtype=dtype,
            use_pallas_pool=config.compile.use_pallas_fused_pool,
        ),
        gpt2=g2.GPT2Config(dtype=dtype),
        prefix_len=config.prefix_len,
        ln_scale=config.ln_scale,
        in_weight=config.in_weight,
        use_pallas_projector=config.compile.use_pallas_prefix_projector,
    )


def load_params(config: InferenceConfig, model_cfg: cm.CaptionModelConfig, seed: int = 0):
    """Checkpoint-or-random parameter load (model_loader.py strict=False
    stance: anything the checkpoint lacks keeps its random init)."""
    init = cm.init_caption_model(jax.random.PRNGKey(seed), model_cfg)
    ckpt = Path(config.ckpt)
    if ckpt.is_file():
        if ckpt.suffix in {".pt", ".pth", ".bin"}:
            from video_caption_tpu.models.convert import (
                convert_caption_checkpoint, load_torch_checkpoint, merge_params,
            )

            state = load_torch_checkpoint(str(ckpt))
            converted = convert_caption_checkpoint(state, model_cfg)
            log.info("loaded torch checkpoint %s (%d families)", ckpt, len(converted))
            return merge_params(init, converted)
        from video_caption_tpu.training.checkpoint import restore_params

        restored = restore_params(str(ckpt), init)
        if restored is not None:
            return restored
    log.warning("checkpoint %s not found; using randomly initialized parameters", ckpt)
    return init


class InferenceEngine:
    """frames_dir -> InferenceResult, one compiled program per decode policy."""

    def __init__(self, config: InferenceConfig, params=None, seed: int = 0,
                 model_cfg: Optional[cm.CaptionModelConfig] = None):
        assert_core_runtime_ready()
        enable_compilation_cache()
        self.config = config
        self.memory = MemoryManager(config.memory)
        self.model_cfg = model_cfg or model_config_from_inference(config)
        self.params = params if params is not None else load_params(config, self.model_cfg, seed)
        self.tokenizer = get_tokenizer()
        self._rng = jax.random.PRNGKey(seed)
        self._prefix_fn = jax.jit(
            partial(cm.video_to_prefix, cfg=self.model_cfg), static_argnames=()
        )
        self._prompt_ids: Dict[str, np.ndarray] = {}

    @classmethod
    def from_config(cls, config: InferenceConfig) -> "InferenceEngine":
        return cls(config)

    # ---- compiled pieces ---------------------------------------------------

    def compute_prefix(self, video: jax.Array) -> jax.Array:
        """video [B,T,3,H,W] -> normalized prefix embeddings [B,P,H]."""
        return self._prefix_fn(self.params, video)

    def _tokenize_prompt(self, prompt: str) -> np.ndarray:
        if prompt not in self._prompt_ids:
            if prompt:
                ids = self.tokenizer.encode(prompt)
            else:
                ids = [self.tokenizer.bos_token_id]
            self._prompt_ids[prompt] = np.asarray(ids, np.int32)
        return self._prompt_ids[prompt]

    def _decode_params(self, **decode_kwargs) -> DecodeParams:
        return DecodeParams(
            max_new_tokens=decode_kwargs.get("max_new_tokens", 24),
            num_beams=decode_kwargs.get("num_beams", 3),
            temperature=decode_kwargs.get("temperature", 1.0),
            top_p=decode_kwargs.get("top_p", 1.0),
            no_repeat_ngram_size=decode_kwargs.get("no_repeat_ngram_size", 3),
            repetition_penalty=decode_kwargs.get("repetition_penalty", 1.1),
            min_new_tokens=decode_kwargs.get("min_new_tokens", 8),
            eos_id=self.tokenizer.eos_token_id,
        )

    def generate_once(self, prefix: jax.Array, prompt: str, **decode_kwargs) -> str:
        """One candidate caption from a precomputed prefix
        (reference counterpart: core/engine.py:40-64 _generate_once)."""
        ids = self._tokenize_prompt(prompt or "")
        input_ids = jnp.asarray(ids)[None, :]
        embeds = cm.build_decoder_inputs(self.params, prefix, input_ids, self.model_cfg)
        dp = self._decode_params(**decode_kwargs)
        self._rng, sub = jax.random.split(self._rng)
        out_ids = generate(self.params["decoder"], self.model_cfg.gpt2, embeds, dp, sub)
        text = self.tokenizer.decode(np.asarray(out_ids[0]), skip_special_tokens=True)
        return clean_text(text.strip())

    # ---- public API --------------------------------------------------------

    def infer(self, frames_dir: str) -> InferenceResult:
        with self.memory.oom_guard():
            video = jnp.asarray(
                load_video_array(
                    frames_dir,
                    num_frames=self.config.num_frames,
                    image_size=self.config.image_size,
                )
            )
            prefix = self.compute_prefix(video)
            c = self.config
            candidates = CaptionCandidates(
                s1=self.generate_once(prefix, c.prompt1, **preset_to_kwargs(c.preset1)),
                s2=self.generate_once(prefix, c.prompt2, **preset_to_kwargs(c.preset2)),
                s3=self.generate_once(prefix, c.prompt3, **preset_to_kwargs(c.preset3)),
            )
            best_key, best_text, _ = select_best(
                [("S1", candidates.s1), ("S2", candidates.s2), ("S3", candidates.s3)]
            )
            return InferenceResult(candidates=candidates, best_key=best_key, best_text=best_text)

    def warmup(self, frames_dir: Optional[str] = None) -> float:
        """Trigger compilation of every program the request path needs."""
        start = time.perf_counter()
        video = jnp.zeros(
            (1, self.config.num_frames, 3, self.config.image_size, self.config.image_size),
            jnp.float32,
        )
        prefix = self.compute_prefix(video)
        c = self.config
        for preset, prompt in (
            (c.preset1, c.prompt1), (c.preset2, c.prompt2), (c.preset3, c.prompt3)
        ):
            self.generate_once(prefix, prompt, **preset_to_kwargs(preset))
        return time.perf_counter() - start
