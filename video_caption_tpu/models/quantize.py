"""Weight-only int8 quantization for the GPT-2 decoder.

The autoregressive decode step reads every decoder weight per token, so the
loop is weight-bandwidth bound; storing matmul weights as int8 with
per-output-channel fp32 scales halves the HBM traffic vs bf16 (quarters it
vs fp32). Dequantization (int8 -> compute dtype x scale) happens in
registers inside the fused matmul — XLA reads the int8 tensor from HBM.

Quantized tensors: the four matmul weights of every block
(attn_w, proj_w, fc_w, out_w). Embeddings (wte/wpe — wte doubles as the
logits head), layer norms and biases stay high precision.

Scheme: symmetric per-output-channel, scale = max|w[:, o]| / 127.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANTIZED_BLOCK_WEIGHTS = ("attn_w", "proj_w", "fc_w", "out_w")


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """[..., in, out] -> {"q": int8, "scale": fp32 [..., out]} (symmetric)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)                       # [..., out]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequantize_weight(qw: Dict[str, jax.Array], dtype: Any) -> jax.Array:
    """int8 + scales -> compute-dtype weight (fused into the consumer matmul)."""
    return (qw["q"].astype(jnp.float32) * qw["scale"][..., None, :]).astype(dtype)


def quantize_gpt2_blocks(decoder_params: Dict[str, Any]) -> Dict[str, Any]:
    """Replace the stacked block matmul weights with quantized forms:
    ``attn_w`` -> ``attn_w_q`` (int8 [d, in, out]) + ``attn_w_s`` (fp32 [d, out])."""
    blocks = dict(decoder_params["blocks"])
    for name in QUANTIZED_BLOCK_WEIGHTS:
        if name in blocks:
            qw = quantize_weight(blocks.pop(name))
            blocks[name + "_q"] = qw["q"]
            blocks[name + "_s"] = qw["scale"]
    out = dict(decoder_params)
    out["blocks"] = blocks
    return out


def block_weight(blk: Dict[str, jax.Array], name: str, dtype: Any) -> jax.Array:
    """Fetch a block matmul weight, dequantizing when stored int8."""
    if name + "_q" in blk:
        return dequantize_weight({"q": blk[name + "_q"], "scale": blk[name + "_s"]}, dtype)
    return blk[name].astype(dtype)


def quantization_error(w: jax.Array) -> float:
    """Max relative reconstruction error of the scheme on ``w`` (diagnostics)."""
    qw = quantize_weight(w)
    back = dequantize_weight(qw, jnp.float32)
    denom = jnp.maximum(jnp.max(jnp.abs(w)), 1e-8)
    return float(jnp.max(jnp.abs(back - w.astype(jnp.float32))) / denom)
