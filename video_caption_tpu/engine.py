"""Stateless core inference engine: frames_dir -> three candidate captions ->
best-of-3 (reference: core/engine.py:20-83).

The engine owns model execution and tensor flow only — it knows nothing of
FastAPI, HTTP, sessions, or UI (same layering rule as core/engine.py:23-25).

TPU-first improvements over the reference pipeline:

- the ViT encoder runs ONCE per request; the reference re-encodes the video
  for every preset (core/engine.py:40-42 inside a 3x loop),
- presets with identical decode policies decode as ONE left-padded batched
  program (the two beam presets share one program); multi-video batches add
  their rows to the same programs,
- decode runs as a fixed-shape scan with a static KV cache — no per-token
  Python, no dynamic shapes, no recompilation between requests,
- frames ship as uint8 (normalize on device) through a pipelined chunked
  upload; batched inference exposes dispatch/collect halves so callers
  double-buffer host work against device compute,
- inference parameters are stored bf16 (the decode loop is weight-bandwidth
  bound); optional int8 weight-only quantization for the decoder.
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
from video_caption_tpu.decode.generate import DecodeParams, generate, generate_prefixed
from video_caption_tpu.decode.presets import preset_to_kwargs
from video_caption_tpu.decode.tokenizer import get_tokenizer
from video_caption_tpu.env import assert_core_runtime_ready, enable_compilation_cache
from video_caption_tpu.memory import MemoryManager
from video_caption_tpu.models import caption_model as cm
from video_caption_tpu.models import gpt2 as g2
from video_caption_tpu.models import vit as vt
from video_caption_tpu.postprocessing.candidate_ranker import select_best
from video_caption_tpu.postprocessing.text_cleaner import clean_text
from video_caption_tpu.preprocessing.frame_loader import load_video_array_u8

log = logging.getLogger(__name__)


def model_config_from_inference(config: InferenceConfig) -> cm.CaptionModelConfig:
    dtype = jnp.bfloat16 if config.compile.dtype == "bfloat16" else jnp.float32
    return cm.CaptionModelConfig(
        vit=vt.ViTConfig(
            image_size=config.image_size,
            dtype=dtype,
            use_pallas_pool=config.compile.use_pallas_fused_pool,
            use_pallas_attention=config.compile.use_pallas_encoder_attention,
        ),
        gpt2=g2.GPT2Config(
            dtype=dtype,
            use_pallas_decode=config.compile.use_pallas_decode_attention,
            use_pallas_lm_head=config.compile.use_pallas_lm_head,
            deferred_cache_write=config.compile.deferred_decode_cache_write,
            use_pallas_beam_attention=config.compile.use_pallas_beam_attention,
            sample_split_cache=config.compile.sample_split_cache,
            use_pallas_decode_layer=(
                config.compile.use_pallas_decode_layer
                and not config.compile.quantize_decoder_int8  # kernel reads plain weights
            ),
        ),
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
    if ckpt.is_file() and ckpt.suffix in {".pt", ".pth", ".bin"}:
        from video_caption_tpu.models.convert import (
            convert_caption_checkpoint, load_torch_checkpoint, merge_params,
        )

        state = load_torch_checkpoint(str(ckpt))
        converted = convert_caption_checkpoint(state, model_cfg)
        log.info("loaded torch checkpoint %s (%d families)", ckpt, len(converted))
        return merge_params(init, converted)
    if ckpt.exists():  # orbax checkpoints are directories
        from video_caption_tpu.training.checkpoint import restore_params

        restored = restore_params(str(ckpt), init)
        if restored is not None:
            log.info("loaded orbax checkpoint %s", ckpt)
            return restored
        # An existing-but-unrestorable checkpoint must never silently serve
        # random weights: fail loudly instead.
        raise RuntimeError(
            f"checkpoint {ckpt} exists but could not be restored; refusing to "
            "serve randomly initialized parameters (see log for the orbax error)"
        )
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
        if self.model_cfg.vit.dtype == jnp.bfloat16:
            # Inference params are stored bf16: the decode step reads every
            # GPT-2 weight each token, so fp32 storage doubles the HBM
            # traffic of the bandwidth-bound loop (and the in-scan casts
            # can't always be hoisted). Training keeps fp32 masters.
            self.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                self.params,
            )
        if config.compile.quantize_decoder_int8:
            # after the bf16 cast so the per-channel scales stay fp32
            from video_caption_tpu.models.quantize import quantize_gpt2_blocks

            self.params = dict(self.params)
            self.params["decoder"] = quantize_gpt2_blocks(self.params["decoder"])
        self.mesh = None
        if config.mesh.num_devices > 1:
            # multi-chip inference: parameters sharded by the TP rules, batch
            # dim of infer_batch sharded over the data axis (SURVEY §5.8's
            # reserved-multichip boundary, actually wired)
            from video_caption_tpu.parallel import make_mesh, shard_params

            self.mesh = make_mesh(config.mesh, jax.devices()[: config.mesh.num_devices])
            # replicate_embeddings: the inference placement — a vocab-sharded
            # wte would make every decode step all-gather the full [rows,
            # vocab] logits for top-k (77 MB/step at production geometry)
            self.params = shard_params(self.params, self.mesh,
                                       replicate_embeddings=True)
            import dataclasses as _dc

            # mesh-safe candidate gather in the decode selection (the
            # single-chip flat-row gather makes GSPMD all-gather candidate
            # windows every step; GPT2Config.spmd_decode docstring)
            self.model_cfg = _dc.replace(
                self.model_cfg,
                gpt2=_dc.replace(self.model_cfg.gpt2, spmd_decode=True))
        self.tokenizer = get_tokenizer()
        import os
        from collections import OrderedDict

        # device-resident LRU of uploaded videos (keyed dir+mtime); repeat
        # requests skip JPEG decode AND the host->device wire
        import threading

        self._video_cache: "OrderedDict" = OrderedDict()
        self._video_cache_lock = threading.Lock()
        self._video_cache_total = 0
        # device copies of the (constant) tiled prompt ids/masks, keyed
        # (policy, batch, prompt bytes) — see run_decode_group
        self._prompt_cache: Dict = {}
        self._video_cache_bytes = int(
            os.environ.get("VIDEO_CAPTION_VIDEO_CACHE_MB", "256")
        ) * 1024 * 1024
        self._rng = jax.random.PRNGKey(seed)
        self._prefix_fn = jax.jit(
            partial(cm.video_to_prefix, cfg=self.model_cfg), static_argnames=()
        )
        # per-chunk frame encoder for the overlapped single-request path
        # (CompileConfig.overlap_single_upload): [C,3,H,W] -> [C, embed_dim]
        self._chunk_encode_fn = jax.jit(
            partial(cm.encode_frames, cfg=self.model_cfg)
        )
        # raw 4:2:0 planes -> RGB uint8 on device (bit-exact with the PIL
        # path; preprocessing/yuv420.py) — the wire carries half the bytes
        from video_caption_tpu.preprocessing.yuv420 import yuv420_packed_to_rgb_chw

        size = config.image_size
        self._yuv_fn = jax.jit(lambda p: yuv420_packed_to_rgb_chw(p, size))
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
            top_k=decode_kwargs.get("top_k", 50),  # HF GenerationConfig default
            no_repeat_ngram_size=decode_kwargs.get("no_repeat_ngram_size", 3),
            repetition_penalty=decode_kwargs.get("repetition_penalty", 1.1),
            min_new_tokens=decode_kwargs.get("min_new_tokens", 8),
            eos_id=self.tokenizer.eos_token_id,
            early_stop=self.config.compile.early_stop_decode,
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

    def _generate_group(self, prefix_rows: jax.Array, prompts, dp: DecodeParams):
        """Decode R (prefix, prompt) rows under ONE policy as one left-padded
        batch. ``prefix_rows`` is [R, P, H], ``prompts`` has length R.

        TPU win over the reference's three sequential decodes
        (core/engine.py:75-79): the single-token decode step is
        weight-bandwidth bound (the whole GPT-2 reads per step), so batching
        same-policy rows — presets of one video AND rows of many videos —
        shares the weight traffic."""
        ids_list = [self._tokenize_prompt(p or "") for p in prompts]
        max_len = max(len(ids) for ids in ids_list)
        g = len(prompts)
        pad_id = self.tokenizer.pad_token_id
        ids_arr = np.full((g, max_len), pad_id, np.int32)
        mask_arr = np.zeros((g, max_len), np.int32)
        for row, ids in enumerate(ids_list):
            ids_arr[row, max_len - len(ids):] = ids       # LEFT padding
            mask_arr[row, max_len - len(ids):] = 1
        self._rng, sub = jax.random.split(self._rng)
        out_ids = generate_prefixed(
            self.params["decoder"], self.model_cfg.gpt2, prefix_rows,
            jnp.asarray(ids_arr), jnp.asarray(mask_arr), dp, sub,
        )
        return np.asarray(out_ids)

    def generate_presets(self, prefix: jax.Array, preset_prompt_pairs):
        """Decode presets for V videos at once.

        ``prefix`` is [V, P, H]; returns ``texts[v][i]`` — or a flat list when
        V == 1 (the single-request path). Rows are grouped by identical
        decode policy across BOTH presets and videos, so V videos with two
        same-policy presets decode as one (2V)-row program.
        """
        v = prefix.shape[0]
        groups: Dict[DecodeParams, list] = {}
        for i, (preset, prompt) in enumerate(preset_prompt_pairs):
            dp = self._decode_params(**preset_to_kwargs(preset))
            groups.setdefault(dp, []).append(i)
        texts = [[""] * len(preset_prompt_pairs) for _ in range(v)]
        for dp, idxs in groups.items():
            # row order: video-major — [(v0,i0), (v0,i1), (v1,i0), ...]
            prompts = [preset_prompt_pairs[i][1] or "" for _ in range(v) for i in idxs]
            prefix_rows = jnp.repeat(prefix, len(idxs), axis=0)
            out_ids = self._generate_group(prefix_rows, prompts, dp)
            for row in range(out_ids.shape[0]):
                vid, slot = divmod(row, len(idxs))
                text = self.tokenizer.decode(out_ids[row], skip_special_tokens=True)
                texts[vid][idxs[slot]] = clean_text(text.strip())
        return texts[0] if v == 1 else texts

    # ---- public API --------------------------------------------------------

    def _video_cache_key(self, frames_dir: str):
        """Cache identity: dir path + a digest of EVERY frame's (name, mtime,
        size) + sampling params — replacing any frame (even one that keeps
        the directory's newest mtime, e.g. a timestamp-preserving rsync)
        changes the key. Returns (key, files) so the miss path can reuse the
        directory listing.

        One scandir pass instead of glob + per-file Path.stat(): DirEntry
        stats resolve via the already-open directory fd (fstatat) with no
        per-file path walk — the warm bs=64 batch pays 64 of these lookups
        per dispatch, and the glob+stat form profiled 23.4 ms/batch of the
        ~35 ms total host work (scripts/profile_warm.py, v5e 2026-08-20)."""
        import os as _os

        entries = []
        try:
            with _os.scandir(frames_dir) as it:
                for e in it:
                    n = e.name
                    if n.startswith("frame_") and n.endswith(".jpg"):
                        st = e.stat()
                        entries.append((n, st.st_mtime_ns, st.st_size))
        except FileNotFoundError:
            raise FileNotFoundError(
                f"No frame_*.jpg files found under {frames_dir}")
        if not entries:
            raise FileNotFoundError(f"No frame_*.jpg files found under {frames_dir}")
        entries.sort()
        stamp = hash(tuple(entries))
        key = (str(frames_dir), stamp, self.config.num_frames, self.config.image_size)
        base = Path(frames_dir)
        files = [base / n for n, _, _ in entries]
        return key, files

    def _video_cache_get(self, frames_dir: str):
        """Returns (key, cached_video_or_None, files)."""
        if self._video_cache_bytes <= 0:
            return None, None, None
        key, files = self._video_cache_key(frames_dir)
        with self._video_cache_lock:  # direct engine.infer may be multithreaded
            hit = self._video_cache.get(key)
            if hit is not None:
                self._video_cache.move_to_end(key)
        return key, hit, files

    def _video_cache_put(self, key, video: jax.Array) -> None:
        if self._video_cache_bytes <= 0 or key is None:
            return
        with self._video_cache_lock:
            old = self._video_cache.pop(key, None)
            if old is not None:
                self._video_cache_total -= old.nbytes
            self._video_cache[key] = video
            self._video_cache_total += video.nbytes
            while self._video_cache_total > self._video_cache_bytes and len(self._video_cache) > 1:
                _, evicted = self._video_cache.popitem(last=False)
                self._video_cache_total -= evicted.nbytes

    def _load_video_to_device(self, frames_dir: str, chunk: int = 4) -> jax.Array:
        """Pipelined upload: decode CHUNK frames, start their (async)
        host->device transfer, decode the next chunk while it flies, then
        concatenate on device. Overlaps JPEG decode with the wire — the two
        are comparable costs on the tunneled chip (30-60ms each).

        Repeat requests for an unchanged frames dir are served from a
        device-resident LRU (the wire is the scarce resource when the chip
        is tunneled; popular/repeated videos skip decode + upload entirely).
        Budget: VIDEO_CAPTION_VIDEO_CACHE_MB (0 disables)."""
        from video_caption_tpu.native.loader import load_frames_native_u8
        from video_caption_tpu.preprocessing.frame_loader import (
            list_frames, load_image_u8, sample_frame_paths,
        )

        key, cached, files = self._video_cache_get(frames_dir)
        if cached is not None:
            return cached
        if files is None:  # cache disabled: list here
            files = list_frames(frames_dir)
        if not files:
            raise FileNotFoundError(f"No frame_*.jpg files found under {frames_dir}")
        picks = sample_frame_paths(files, self.config.num_frames)
        while len(picks) < self.config.num_frames:
            picks.append(picks[-1])
        size = self.config.image_size
        use_yuv = self.config.compile.yuv420_wire
        device_chunks = []
        for start in range(0, len(picks), chunk):
            part = picks[start : start + chunk]
            if use_yuv:
                from video_caption_tpu.native.loader import load_frames_native_yuv420

                packed = load_frames_native_yuv420(part, size)
                if packed is not None:
                    # half the wire bytes; decode finishes on-device (async).
                    # Pad a short tail chunk to the fixed chunk size (slicing
                    # after) so _yuv_fn compiles ONCE — a distinct tail shape
                    # would otherwise trigger its own XLA compile.
                    tail = len(part)
                    if tail < chunk:
                        packed = np.concatenate(
                            [packed, np.repeat(packed[-1:], chunk - tail, axis=0)]
                        )
                    rgb = self._yuv_fn(jax.device_put(packed))
                    device_chunks.append(rgb[:tail] if tail < chunk else rgb)
                    continue
            arr = load_frames_native_u8(part, size)
            if arr is None:
                arr = np.stack([load_image_u8(p, size) for p in part])
            device_chunks.append(jax.device_put(arr))   # async transfer
        video = jnp.concatenate(device_chunks, axis=0)[None] if len(device_chunks) > 1 \
            else device_chunks[0][None]
        self._video_cache_put(key, video)
        return video

    def infer(self, frames_dir: str) -> InferenceResult:
        with self.memory.oom_guard():
            texts = None
            if (self.config.compile.overlap_single_upload
                    and self.mesh is None):
                feats = self._load_feats_overlapped(frames_dir)
                if feats is not None:
                    texts = self._collect_videos(self._dispatch_feats(feats))[0]
            if texts is None:
                video = self._load_video_to_device(frames_dir)
                texts = self._infer_videos(video)[0]
            candidates = CaptionCandidates(s1=texts[0], s2=texts[1], s3=texts[2])
            best_key, best_text, _ = select_best(
                [("S1", candidates.s1), ("S2", candidates.s2), ("S3", candidates.s3)]
            )
            return InferenceResult(candidates=candidates, best_key=best_key, best_text=best_text)

    def _fused_infer_program(self):
        """Build (lazily) ONE jitted program for the whole request:
        video -> prefix -> every decode-policy group, single dispatch.

        On a tunneled TPU each dispatch costs a host round-trip (~30ms
        measured), so prefix + N group decodes as separate calls waste
        N*30ms per request; fusing them into one program removes that.
        Prompt ids/masks for the config's presets are baked in as constants.
        """
        if getattr(self, "_fused_program", None) is not None:
            return self._fused_program
        c = self.config
        pairs = [(c.preset1, c.prompt1), (c.preset2, c.prompt2), (c.preset3, c.prompt3)]
        groups: Dict[DecodeParams, list] = {}
        for i, (preset, prompt) in enumerate(pairs):
            dp = self._decode_params(**preset_to_kwargs(preset))
            groups.setdefault(dp, []).append(i)
        group_list = []
        for dp, idxs in groups.items():
            ids_list = [self._tokenize_prompt(pairs[i][1] or "") for i in idxs]
            max_len = max(len(ids) for ids in ids_list)
            ids_arr = np.full((len(idxs), max_len), self.tokenizer.pad_token_id, np.int32)
            mask_arr = np.zeros((len(idxs), max_len), np.int32)
            for row, ids in enumerate(ids_list):
                ids_arr[row, max_len - len(ids):] = ids
                mask_arr[row, max_len - len(ids):] = 1
            group_list.append((dp, tuple(idxs), ids_arr, mask_arr))
        model_cfg = self.model_cfg
        use_unified = self._unified_eligible(group_list, fused_program=True)

        from video_caption_tpu.decode import generate as gen
        from video_caption_tpu.decode.unified import generate_unified

        @jax.jit
        def program(params, video, rng):
            prefix = cm.video_to_prefix(params, video, model_cfg)     # [V,P,H]
            v = prefix.shape[0]
            keys = []
            for _ in group_list:
                rng, sub = jax.random.split(rng)
                keys.append(sub)
            if use_unified:
                # one program, one per-step weight stream for EVERY group
                prompts = tuple(
                    (jnp.asarray(ids_arr), jnp.asarray(mask_arr))
                    for _, _, ids_arr, mask_arr in group_list
                )
                dps = tuple(dp for dp, *_ in group_list)
                return generate_unified(
                    params["decoder"], model_cfg.gpt2, prefix, prompts, dps,
                    tuple(keys),
                )
            outs = []
            for (dp, idxs, ids_arr, mask_arr), sub in zip(group_list, keys):
                outs.append(self.run_decode_group(
                    prefix, dp, ids_arr, mask_arr, sub, params=params))
            return tuple(outs)

        self._fused_program = (program, group_list, len(pairs))
        return self._fused_program

    def _aot_single_exec(self, example_key):
        """Build (lazily) the AOT-compiled executable of the fused
        single-video request program — the serving analog of the reference's
        reserved TRT runtime (core/trt/runtime.py:6, via aot.py).

        ``lower().compile()`` pins the executable once; calling it directly
        skips jax.jit's per-call dispatch (signature hashing + arg-tree
        matching) on the hottest latency path. Falls back to the jit path
        (returns None) if AOT compilation is unavailable on the backend.
        """
        if getattr(self, "_aot_single", None) is not None:
            return self._aot_single or None   # False sentinel = build failed
        program, _, _ = self._fused_infer_program()
        c = self.config
        video_s = jax.ShapeDtypeStruct(
            (1, c.num_frames, 3, c.image_size, c.image_size), jnp.uint8)
        try:
            self._aot_single = program.lower(
                self.params, video_s, example_key).compile()
        except Exception as exc:   # backend without AOT support
            log.warning("AOT single-request compile failed (%s); jit path", exc)
            self._aot_single = False
        return self._aot_single or None

    def _fused_feats_program(self):
        """Companion of ``_fused_infer_program`` taking per-frame ViT
        features [1, T, embed_dim] instead of pixels — the second half of
        the overlapped single-request path (the trunk ran per-chunk in
        ``_load_feats_overlapped`` while later chunks were on the wire)."""
        if getattr(self, "_feats_program", None) is not None:
            return self._feats_program
        program_px, group_list, n_pairs = self._fused_infer_program()
        model_cfg = self.model_cfg
        use_unified = self._unified_eligible(group_list, fused_program=True)

        from video_caption_tpu.decode.unified import generate_unified

        @jax.jit
        def program(params, feats, rng):
            prefix = cm.frames_to_prefix(params, feats, model_cfg)    # [1,P,H]
            keys = []
            for _ in group_list:
                rng, sub = jax.random.split(rng)
                keys.append(sub)
            if use_unified:
                prompts = tuple(
                    (jnp.asarray(ids_arr), jnp.asarray(mask_arr))
                    for _, _, ids_arr, mask_arr in group_list
                )
                dps = tuple(dp for dp, *_ in group_list)
                return generate_unified(
                    params["decoder"], model_cfg.gpt2, prefix, prompts, dps,
                    tuple(keys),
                )
            outs = []
            for (dp, idxs, ids_arr, mask_arr), sub in zip(group_list, keys):
                outs.append(self.run_decode_group(
                    prefix, dp, ids_arr, mask_arr, sub, params=params))
            return tuple(outs)

        self._feats_program = (program, group_list, n_pairs)
        return self._feats_program

    def _aot_single_feats_exec(self, example_key):
        """AOT executable of the feats request program (see _aot_single_exec)."""
        if getattr(self, "_aot_feats", None) is not None:
            return self._aot_feats or None
        program, _, _ = self._fused_feats_program()
        c = self.config
        feats_s = jax.ShapeDtypeStruct(
            (1, c.num_frames, self.model_cfg.vit.embed_dim),
            self.model_cfg.vit.dtype)
        try:
            self._aot_feats = program.lower(
                self.params, feats_s, example_key).compile()
        except Exception as exc:
            log.warning("AOT feats-request compile failed (%s); jit path", exc)
            self._aot_feats = False
        return self._aot_feats or None

    def _load_feats_overlapped(self, frames_dir: str, chunk: int = 8):
        """Overlapped cold-path load for a single request: per chunk of
        ``chunk`` frames, start the (async) host->device transfer AND
        dispatch the per-chunk ViT trunk — chunk N's encode runs on device
        while chunk N+1 is decoding JPEGs / on the wire. Returns per-frame
        features [1, T, embed_dim], or None when the path doesn't apply
        (video-cache hit — pixels already on device — or non-cls pooling).
        The assembled pixel chunks still feed the device video cache so
        warm repeats keep skipping the wire."""
        if self.model_cfg.vit.pool != "cls":
            return None
        from video_caption_tpu.native.loader import load_frames_native_u8
        from video_caption_tpu.preprocessing.frame_loader import (
            list_frames, load_image_u8, sample_frame_paths,
        )

        key, cached, files = self._video_cache_get(frames_dir)
        if cached is not None:
            return None                       # warm path: pixel program
        if files is None:
            files = list_frames(frames_dir)
        if not files:
            raise FileNotFoundError(f"No frame_*.jpg files found under {frames_dir}")
        picks = sample_frame_paths(files, self.config.num_frames)
        while len(picks) < self.config.num_frames:
            picks.append(picks[-1])
        size = self.config.image_size
        use_yuv = self.config.compile.yuv420_wire
        feat_chunks, pixel_chunks = [], []
        for start in range(0, len(picks), chunk):
            part = picks[start:start + chunk]
            rgb = None
            if use_yuv:
                from video_caption_tpu.native.loader import load_frames_native_yuv420

                packed = load_frames_native_yuv420(part, size)
                if packed is not None:
                    tail = len(part)
                    if tail < chunk:
                        packed = np.concatenate(
                            [packed, np.repeat(packed[-1:], chunk - tail, axis=0)])
                    rgb = self._yuv_fn(jax.device_put(packed))
                    if tail < chunk:
                        rgb = rgb[:tail]
            if rgb is None:
                arr = load_frames_native_u8(part, size)
                if arr is None:
                    arr = np.stack([load_image_u8(p, size) for p in part])
                rgb = jax.device_put(arr)
            pixel_chunks.append(rgb)
            # async dispatch: the trunk for this chunk queues behind its own
            # transfer and runs while the next chunk is still host-side
            feat_chunks.append(self._chunk_encode_fn(self.params, rgb))
        feats = jnp.concatenate(feat_chunks, axis=0)[None]      # [1,T,E]
        video = jnp.concatenate(pixel_chunks, axis=0)[None] if len(pixel_chunks) > 1 \
            else pixel_chunks[0][None]
        self._video_cache_put(key, video)
        return feats

    def _dispatch_feats(self, feats: jax.Array):
        """Enqueue the feats request program (overlapped single-request
        path); returns the same handle shape as ``_dispatch_videos``."""
        program, group_list, n_pairs = self._fused_feats_program()
        self._rng, sub = jax.random.split(self._rng)
        aot = self._aot_single_feats_exec(sub) if (
            self.config.compile.aot_request_program and self.mesh is None
        ) else None
        if aot is not None:
            outs = aot(self.params, feats, sub)
        else:
            outs = program(self.params, feats, sub)
        return outs, group_list, n_pairs, 1

    def _unified_eligible(self, group_list, fused_program: bool = False) -> bool:
        """The unified mixed-policy program replaces per-group programs when
        there are >= 2 policy groups and no incompatible experimental mode
        (the fused decode-layer kernel commits a different cache layout;
        early_stop commits a while_loop per group).

        ``fused_program``: inside the fused request program the groups run
        SEQUENTIALLY in one XLA program (no async pipelining to lose), so
        the unified program's shared per-step weight stream is a strict win
        there (CompileConfig.unified_fused_request) even while the batched
        async-dispatch path keeps grouped decode."""
        want = self.config.compile.unified_decode or (
            fused_program and self.config.compile.unified_fused_request
        )
        return (
            want
            and len(group_list) > 1
            and not self.model_cfg.gpt2.use_pallas_decode_layer
            and not any(dp.early_stop for dp, *_ in group_list)
        )

    def _dispatch_videos(self, video: jax.Array):
        """Enqueue every device program for ``video`` WITHOUT materializing
        results — dispatches are async, so the caller can overlap the next
        request's host work (JPEG decode, transfer) with this one's device
        compute (double buffering). Returns an opaque handle for
        ``_collect_videos``.

        Two dispatch strategies (CompileConfig.fuse_request_program):
        - fused: one jitted program for the whole request,
        - unfused (default): prefix + one program per decode group — measures
          faster on the tunneled chip."""
        program, group_list, n_pairs = self._fused_infer_program()
        self._rng, sub = jax.random.split(self._rng)
        use_fused = self.config.compile.fuse_request_program or (
            video.shape[0] == 1 and self.config.compile.fuse_single_request
        )
        if use_fused:
            aot = self._aot_single_exec(sub) if (
                video.shape[0] == 1 and self.config.compile.aot_request_program
                and self.mesh is None
            ) else None
            if aot is not None:
                outs = aot(self.params, video, sub)
            else:
                outs = program(self.params, video, sub)
        elif self._unified_eligible(group_list):
            # prefix as its own async dispatch (pipelines with host work),
            # then ONE unified program decodes every policy group — the
            # per-step GPT-2 weight stream is shared across groups
            from video_caption_tpu.decode.unified import generate_unified

            prefix = self._prefix_fn(self.params, video)
            keys = []
            for _ in group_list:
                sub, key = jax.random.split(sub)
                keys.append(key)
            prompts = self._prompt_cache.get("unified")
            if prompts is None:  # constant per engine config — upload once
                prompts = tuple(
                    (jnp.asarray(ids_arr), jnp.asarray(mask_arr))
                    for _, _, ids_arr, mask_arr in group_list
                )
                self._prompt_cache["unified"] = prompts
            dps = tuple(dp for dp, *_ in group_list)
            outs = generate_unified(
                self.params["decoder"], self.model_cfg.gpt2, prefix, prompts,
                dps, tuple(keys),
            )
        else:
            prefix = self._prefix_fn(self.params, video)
            outs = []
            for dp, idxs, ids_arr, mask_arr in group_list:
                sub, key = jax.random.split(sub)
                outs.append(self.run_decode_group(prefix, dp, ids_arr, mask_arr, key))
        # start the device->host copy of every output now: when the decode
        # programs finish, the (tiny) token buffers stream to the host
        # immediately, so the collect-side device_get is a local read
        # instead of a post-completion round trip on the tunneled link
        for leaf in jax.tree_util.tree_leaves(outs):
            try:
                leaf.copy_to_host_async()
            except Exception:
                break  # backend without async host copies
        return outs, group_list, n_pairs, video.shape[0]

    def run_decode_group(self, prefix: jax.Array, dp: DecodeParams,
                         ids_arr: np.ndarray, mask_arr: np.ndarray, key,
                         params=None):
        """Decode ONE policy group for all videos of ``prefix`` [V,P,H] —
        the engine's single group-dispatch point (also measured by
        bench/roofline.py so benchmarks see exactly the serving path).

        Measured v5e bs=64 (roofline, 2026-08-17): routing single groups
        through generate_unified's split-cache machinery was NEUTRAL for
        beam groups (183.5 vs 182.0 ms — it IS the same gpt2_beam_step) and
        WORSE for the 64-row sampled group (72.4 vs 65.9 ms — the plain
        contiguous-cache program wins at small row counts), so single
        groups keep their dedicated paths; the unified program is for
        multi-group fusion (CompileConfig.unified_decode)."""
        params = self.params if params is None else params
        v = prefix.shape[0]
        prefix_rows = jnp.repeat(prefix, ids_arr.shape[0], axis=0)
        # prompts are constants per (policy, batch) — cache their device
        # copies instead of re-uploading every dispatch (each tiny upload
        # still pays a host->device trip on a tunneled link; the warm path
        # dispatches 1-3 groups per batch)
        pk = (dp, v, ids_arr.tobytes(), mask_arr.tobytes())
        cached = self._prompt_cache.get(pk)
        if cached is None:
            cached = (jnp.asarray(np.tile(ids_arr, (v, 1))),
                      jnp.asarray(np.tile(mask_arr, (v, 1))))
            self._prompt_cache[pk] = cached
        ids, mask = cached
        return generate_prefixed(
            params["decoder"], self.model_cfg.gpt2, prefix_rows, ids, mask,
            dp, key,
        )

    def _collect_videos(self, handle) -> list:
        """Materialize a ``_dispatch_videos`` handle -> texts[v][preset_idx]."""
        outs, group_list, n_pairs, v = handle
        texts = [[""] * n_pairs for _ in range(v)]
        # one device_get for every group: each separate fetch pays a full
        # host<->device round trip (tens of ms on a tunneled link)
        outs = jax.device_get(list(outs))
        for (dp, idxs, _, _), out in zip(group_list, outs):
            arr = np.asarray(out)
            for row in range(arr.shape[0]):
                vid, slot = divmod(row, len(idxs))
                text = self.tokenizer.decode(arr[row], skip_special_tokens=True)
                texts[vid][idxs[slot]] = clean_text(text.strip())
        return texts

    def _infer_videos(self, video: jax.Array) -> list:
        return self._collect_videos(self._dispatch_videos(video))

    def infer_batch_dispatch(self, frames_dirs):
        """Async half of infer_batch: loads + uploads + enqueues the device
        programs and returns a handle; pair with ``infer_batch_collect``.
        Lets a driver overlap batch N+1's host work with batch N's device
        compute (used by tools/batch_infer's pipelined loop)."""
        with self.memory.oom_guard():
            if self.mesh is not None:
                from video_caption_tpu.parallel import shard_batch

                loaded = [load_video_array_u8(
                    d, self.config.num_frames, self.config.image_size
                ) for d in frames_dirs]
                device_videos = shard_batch({"v": np.concatenate(loaded)}, self.mesh)["v"]
            elif len(frames_dirs) > 1:
                # streaming upload: worker threads JPEG-decode cache-miss
                # videos while the main thread ships each finished video to
                # the device (async), overlapping decode with the wire;
                # repeated dirs come straight from the device-resident LRU
                from concurrent.futures import ThreadPoolExecutor

                keys, slots = [], []
                miss_by_key: Dict = {}
                # key computation is stat-bound (scandir per dir; syscalls
                # release the GIL) — thread it across dirs for large batches
                if len(frames_dirs) >= 8 and self._video_cache_bytes > 0:
                    with ThreadPoolExecutor(max_workers=8) as kpool:
                        lookups = list(kpool.map(self._video_cache_get, frames_dirs))
                else:
                    lookups = [self._video_cache_get(d) for d in frames_dirs]
                for i, (key, hit, _) in enumerate(lookups):
                    keys.append(key)
                    slots.append(hit)
                    if hit is None:
                        # dedupe: identical dirs in one batch decode ONCE
                        miss_by_key.setdefault(key or ("nocache", i), []).append(i)
                if miss_by_key:
                    import os as _os

                    from video_caption_tpu.preprocessing.frame_loader import (
                        load_video_packed,
                    )

                    groups = list(miss_by_key.values())
                    workers = min(len(groups), max(_os.cpu_count() or 1, 1), 8)
                    use_yuv = self.config.compile.yuv420_wire
                    with ThreadPoolExecutor(max_workers=workers) as pool:
                        for idxs, (kind, arr) in zip(groups, pool.map(
                            lambda d: load_video_packed(
                                d, self.config.num_frames, self.config.image_size,
                                allow_yuv420=use_yuv,
                            ),
                            [frames_dirs[g[0]] for g in groups],
                        )):
                            if kind == "yuv420":
                                # raw planes ride the wire (half the bytes);
                                # on-device finish is async like the upload
                                vid = self._yuv_fn(jax.device_put(arr))[None]
                            else:
                                vid = jax.device_put(arr)
                            self._video_cache_put(keys[idxs[0]], vid)
                            for i in idxs:
                                slots[i] = vid
                device_videos = jnp.concatenate(slots, axis=0)
            else:
                device_videos = self._load_video_to_device(frames_dirs[0])
            return self._dispatch_videos(device_videos)

    def infer_batch_collect(self, handle) -> list:
        """Materialize an ``infer_batch_dispatch`` handle into results.
        Device errors (incl. OOM) surface here, not at dispatch — hence the
        guard on the collect side too."""
        results = []
        with self.memory.oom_guard():
            collected = self._collect_videos(handle)
        for texts in collected:
            candidates = CaptionCandidates(s1=texts[0], s2=texts[1], s3=texts[2])
            best_key, best_text, _ = select_best(
                [("S1", texts[0]), ("S2", texts[1]), ("S3", texts[2])]
            )
            results.append(InferenceResult(
                candidates=candidates, best_key=best_key, best_text=best_text
            ))
        return results

    def infer_batch(self, frames_dirs) -> list:
        """Batched multi-video inference — the in-process replacement for the
        reference's subprocess-per-video batch tool (tools/batch_infer.py:
        29-73): ONE encoder pass over all videos and grouped decodes whose
        rows span videos x presets. Returns [InferenceResult, ...]."""
        return self.infer_batch_collect(self.infer_batch_dispatch(frames_dirs))

    def warmup(self, frames_dir: Optional[str] = None) -> float:
        """Trigger compilation of every program the request path needs."""
        start = time.perf_counter()
        video = jnp.zeros(
            (1, self.config.num_frames, 3, self.config.image_size, self.config.image_size),
            jnp.uint8,
        )
        self._infer_videos(video)
        if (self.config.compile.overlap_single_upload and self.mesh is None
                and self.model_cfg.vit.pool == "cls"):
            # compile the overlapped cold path too: per-chunk trunk + the
            # feats request program (AOT) — cold requests hit these first
            chunk = jnp.zeros((4, 3, self.config.image_size,
                               self.config.image_size), jnp.uint8)
            feats = self._chunk_encode_fn(self.params, chunk)
            t = self.config.num_frames
            feats = jnp.tile(feats, (-(-t // 4), 1))[:t][None]
            self._collect_videos(self._dispatch_feats(feats))
        return time.perf_counter() - start
