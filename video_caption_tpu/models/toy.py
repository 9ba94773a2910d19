"""Tiny stand-in models for pipeline smoke tests — the reference's
"minimal runnable model" testing idea (SURVEY §4):

- ``SimpleVideoCaptioner`` (src/models/simple_vc.py:37-56): mean-pool video
  -> Linear -> per-position vocab logits,
- ``TinyCaptioner`` (src/models/tiny_captioner.py:18-32): video-conditioned
  GRU language model,
- ``SimpleAlignModel`` (inline in src/cli/train.py:13-44): mean-pooled video
  and text through small MLPs, cosine-embedding alignment.

These exercise data -> loss -> optimizer cheaply before the real model.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class ToyConfig:
    vocab_size: int = 128
    hidden: int = 64
    max_len: int = 16


def _dense(key, d_in, d_out):
    w = jax.nn.initializers.normal(0.02)(key, (d_in, d_out), jnp.float32)
    return {"w": w, "b": jnp.zeros((d_out,))}


# --- SimpleVideoCaptioner ----------------------------------------------------

def init_simple_vc(key: jax.Array, cfg: ToyConfig, video_feat_dim: int = 3 * 32 * 32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "enc": _dense(k1, video_feat_dim, cfg.hidden),
        "head": _dense(k2, cfg.hidden, cfg.vocab_size * cfg.max_len),
    }


def simple_vc_logits(params: Params, video: jax.Array, cfg: ToyConfig) -> jax.Array:
    """[B,T,3,H,W] -> [B, max_len, vocab] logits."""
    b = video.shape[0]
    feat = jnp.mean(video.reshape(b, video.shape[1], -1), axis=1)
    h = jax.nn.relu(feat @ params["enc"]["w"] + params["enc"]["b"])
    out = h @ params["head"]["w"] + params["head"]["b"]
    return out.reshape(b, cfg.max_len, cfg.vocab_size)


# --- TinyCaptioner (GRU LM) --------------------------------------------------

def init_tiny_captioner(key: jax.Array, cfg: ToyConfig, video_feat_dim: int = 3 * 32 * 32) -> Params:
    ks = jax.random.split(key, 6)
    h = cfg.hidden
    return {
        "video_proj": _dense(ks[0], video_feat_dim, h),
        "embed": jax.nn.initializers.normal(0.02)(ks[1], (cfg.vocab_size, h), jnp.float32),
        "gru_rz": _dense(ks[2], 2 * h, 2 * h),   # reset/update gates
        "gru_n": _dense(ks[3], 2 * h, h),        # candidate state
        "head": _dense(ks[4], h, cfg.vocab_size),
    }


def tiny_captioner_logits(params: Params, video: jax.Array, ids: jax.Array, cfg: ToyConfig) -> jax.Array:
    """Video-conditioned GRU LM: [B,T,3,H,W], [B,L] -> [B,L,vocab]."""
    b, l = ids.shape
    feat = jnp.mean(video.reshape(b, video.shape[1], -1), axis=1)
    h0 = jnp.tanh(feat @ params["video_proj"]["w"] + params["video_proj"]["b"])
    x = params["embed"][ids]  # [B,L,H]

    def step(h, xt):
        cat = jnp.concatenate([xt, h], axis=-1)
        rz = jax.nn.sigmoid(cat @ params["gru_rz"]["w"] + params["gru_rz"]["b"])
        r, z = jnp.split(rz, 2, axis=-1)
        cat_n = jnp.concatenate([xt, r * h], axis=-1)
        n = jnp.tanh(cat_n @ params["gru_n"]["w"] + params["gru_n"]["b"])
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, x.transpose(1, 0, 2))
    hs = hs.transpose(1, 0, 2)  # [B,L,H]
    return hs @ params["head"]["w"] + params["head"]["b"]


# --- SimpleAlignModel --------------------------------------------------------

def init_simple_align(key: jax.Array, cfg: ToyConfig, d: int = 256) -> Params:
    """Dry-run alignment model (src/cli/train.py:13-44): video mean over
    (T,H,W) -> [B,3] -> Linear(3,d); text embedding masked-mean -> Linear(d,d);
    both L2-normalized, CosineEmbeddingLoss with target +1."""
    ks = jax.random.split(key, 3)
    return {
        "vid_proj": _dense(ks[0], 3, d),
        "txt_emb": jax.nn.initializers.normal(0.02)(ks[1], (cfg.vocab_size, d), jnp.float32),
        "txt_proj": _dense(ks[2], d, d),
    }


def simple_align_embeddings(params: Params, video: jax.Array, ids: jax.Array, mask: jax.Array):
    v = jnp.mean(video, axis=(1, 3, 4))  # [B,3]
    v = v @ params["vid_proj"]["w"] + params["vid_proj"]["b"]
    tfeat = params["txt_emb"][ids] * mask[..., None]
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    t = jnp.sum(tfeat, axis=1) / denom
    t = t @ params["txt_proj"]["w"] + params["txt_proj"]["b"]
    norm = lambda x: x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)  # noqa: E731
    return norm(v), norm(t)


def simple_align_loss(params: Params, video: jax.Array, ids: jax.Array, mask: jax.Array) -> jax.Array:
    v, t = simple_align_embeddings(params, video, ids, mask)
    return jnp.mean(1.0 - jnp.sum(v * t, axis=-1))
