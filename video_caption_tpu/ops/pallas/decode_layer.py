"""Fused GPT-2 decode-step kernel: ONE Pallas program per decode step,
grid over layers.

Why: the single-token decode step is not FLOP- or bandwidth-bound — it is
OP- and LATENCY-bound. The XLA step at B=32 issues ~300 small ops; a
first fused version ran each LAYER as its own pallas_call and the kernels
measured only ~40us each, but twelve separate launches per step serialized
their 14 MB weight DMAs with compute (~1.3 ms/step of gaps — SLOWER than
XLA). This version runs the WHOLE step as one kernel with ``grid =
(n_layer,)``: Mosaic's grid pipeline prefetches layer i+1's weight blocks
while layer i computes, the residual stream lives in a VMEM scratch across
grid steps, and each layer performs —

    LN1 -> fused QKV matmul -> KV cache row write (in-place, aliased) ->
    masked cache attention (per-head static slices, [max_len, B]
    orientation) -> projection -> residual -> LN2 -> MLP (tanh-GELU) ->
    residual

Mosaic constraints that shaped this kernel (each cost a compile failure):
- dynamic stores lower only on the LEADING dim -> cache is
  [L, max_len, B, 2H] with ``None``-squeezed layer blocks, row write at
  ``pl.ds(offset, 1)``;
- batched dot_general forms are rejected -> the hd=64-deep attention
  contractions run as broadcast-multiply-reduce on the VPU (they are
  ~100k FLOP/head — MXU irrelevant);
- ``ref[0]`` integer indexing lowers via an unsupported gather -> biases
  are [1, N] refs consumed with ``ref[:]`` broadcasting.

Weights must arrive pre-cast to the compute dtype (models/gpt2.py casts
them OUTSIDE the decode scan so the cast runs once per generate call, not
once per token).

Math matches models/gpt2.py's stacked decode branch (f32 LN/softmax/logits
accumulation, bf16 elsewhere); outputs agree to bf16 rounding.

This path is COMMITTED once the caller selects the flat-cache layout
(platform-gated in models/gpt2.init_cache): no per-call graceful fallback,
because the cache layout decision is made at trace time.

STATUS — experimental, DEFAULT OFF. Measured on v5e-1 at B=32/24 tokens:
sampled group 67 ms vs 51 ms for the XLA path. The kernel bodies are fast
(~40 us/layer) but the full per-layer cache block must DMA in AND out of
VMEM every layer (the aliased output block write-back is whole-block), and
the weight-block prefetch does not hide enough of the ~264 MB/step of DMA
to beat XLA's in-place cache updates. Kept behind
VIDEO_CAPTION_PALLAS_DECODE_LAYER for future tuning (candidates: manual
double-buffered DMA with row-granular write-back via memory_space=ANY).
Token parity with the XLA path is pinned by test_pallas_ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024


def _ln(xf: jax.Array, scale, bias, eps: float) -> jax.Array:
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _decode_step_kernel(
    # inputs (per-grid-step blocks; layer dim squeezed via None block dims)
    x_ref,        # [B, H]   compute dtype (constant block)
    kvf_in_ref,   # [max_len, B, 2H] — this layer's cache (aliased)
    valid_ref,    # [max_len, B] int32 (pre-transposed; constant block)
    off_ref,      # [1, 1] int32 (SMEM)
    ln1s_ref, ln1b_ref,          # [1, H] f32
    attnw_ref,    # [H, 3H]
    attnb_ref,    # [1, 3H]
    projw_ref, projb_ref,        # [H, H], [1, H]
    ln2s_ref, ln2b_ref,          # [1, H] f32
    fcw_ref, fcb_ref,            # [H, 4H], [1, 4H]
    outw_ref, outb_ref,          # [4H, H], [1, H]
    # outputs
    xo_ref,       # [B, H]
    kvf_out_ref,  # [max_len, B, 2H]
    # scratch
    x_scr,        # VMEM [B, H] — residual stream across grid steps
    *,
    n_layer: int,
    num_heads: int,
    head_dim: int,
    ln_eps: float,
):
    layer = pl.program_id(0)

    @pl.when(layer == 0)
    def _seed():
        x_scr[:] = x_ref[:]

    x = x_scr[:]
    dt = x.dtype
    h = num_heads * head_dim
    offset = off_ref[0, 0]
    max_len, b, _ = kvf_in_ref.shape

    xn = _ln(x.astype(jnp.float32), ln1s_ref[:], ln1b_ref[:], ln_eps).astype(dt)
    qkv = jax.lax.dot_general(
        xn, attnw_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dt) + attnb_ref[:]

    # in-place row write: the aliased output block must first mirror the
    # input block (aliasing shares the HBM buffer, not the VMEM block)
    kvf_out_ref[:] = kvf_in_ref[:]
    kv_row = qkv[:, h:]
    kvf_out_ref[pl.ds(offset, 1), :, :] = kv_row[None, :, :]

    scale = head_dim ** -0.5
    row = jax.lax.broadcasted_iota(jnp.int32, (max_len, b), 0)
    mask = (row <= offset) & (valid_ref[:] > 0)                      # [L, B]
    heads = []
    for hi in range(num_heads):
        q = qkv[:, hi * head_dim:(hi + 1) * head_dim]                # [B, hd]
        kc = kvf_out_ref[:, :, hi * head_dim:(hi + 1) * head_dim]    # [L, B, hd]
        vc = kvf_out_ref[:, :, h + hi * head_dim:h + (hi + 1) * head_dim]
        qf = q.astype(jnp.float32)[None]                             # [1, B, hd]
        logits = jnp.sum(qf * kc.astype(jnp.float32), axis=-1) * scale  # [L, B]
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
        logits = logits - jnp.max(logits, axis=0, keepdims=True)
        ex = jnp.exp(logits)
        attn = (ex / jnp.sum(ex, axis=0, keepdims=True)).astype(dt)  # [L, B]
        prod = attn.astype(jnp.float32)[:, :, None] * vc.astype(jnp.float32)
        heads.append(jnp.sum(prod, axis=0).astype(dt))               # [B, hd]
    attn_out = jnp.concatenate(heads, axis=-1)                       # [B, H]
    proj = jax.lax.dot_general(
        attn_out, projw_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dt) + projb_ref[:]
    x1 = x + proj

    mn = _ln(x1.astype(jnp.float32), ln2s_ref[:], ln2b_ref[:], ln_eps).astype(dt)
    m = jax.lax.dot_general(
        mn, fcw_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dt) + fcb_ref[:]
    m = jax.nn.gelu(m.astype(jnp.float32), approximate=True).astype(dt)
    y = jax.lax.dot_general(
        m, outw_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dt) + outb_ref[:]
    x_scr[:] = x1 + y

    @pl.when(layer == n_layer - 1)
    def _emit():
        xo_ref[:] = x_scr[:]


@partial(jax.jit, static_argnames=("num_heads", "ln_eps"))
def gpt2_decode_step(
    x: jax.Array,          # [B, H] compute dtype
    kvf: jax.Array,        # [n_layer, max_len, B, 2H] — aliased in-place
    valid: jax.Array,      # [B, max_len] int32
    offset: jax.Array,     # scalar int32
    blocks: dict,          # stacked per-layer params, weights PRE-CAST to x.dtype
    num_heads: int,
    ln_eps: float = 1e-5,
):
    """Run all ``n_layer`` transformer layers of one decode step as a single
    grid-pipelined Pallas program. Returns (x_out [B,H], updated kvf)."""
    b, h = x.shape
    n_layer, max_len = kvf.shape[0], kvf.shape[1]
    hd = h // num_heads
    dt = x.dtype

    def w2(name):        # [d, I, O] -> per-layer [I, O] blocks
        a = blocks[name]
        return a, pl.BlockSpec((None,) + a.shape[1:], lambda i: (i, 0, 0))

    def w1(name, f32=False):  # [d, N] -> per-layer [1, N] blocks
        a = blocks[name]
        a = a.astype(jnp.float32) if f32 else a
        return a[:, None, :], pl.BlockSpec((None, 1, a.shape[1]), lambda i: (i, 0, 0))

    weight_args = [
        w1("ln1_scale", True), w1("ln1_bias", True),
        w2("attn_w"), w1("attn_b"),
        w2("proj_w"), w1("proj_b"),
        w1("ln2_scale", True), w1("ln2_bias", True),
        w2("fc_w"), w1("fc_b"),
        w2("out_w"), w1("out_b"),
    ]
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    kern = partial(
        _decode_step_kernel,
        n_layer=n_layer, num_heads=num_heads, head_dim=hd, ln_eps=ln_eps,
    )
    x_out, kvf_out = pl.pallas_call(
        kern,
        grid=(n_layer,),
        in_specs=[
            const((b, h)),
            pl.BlockSpec((None, max_len, b, 2 * h), lambda i: (i, 0, 0, 0)),
            const((max_len, b)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [spec for _, spec in weight_args],
        out_specs=(
            const((b, h)),
            pl.BlockSpec((None, max_len, b, 2 * h), lambda i: (i, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h), dt),
            jax.ShapeDtypeStruct(kvf.shape, kvf.dtype),
        ),
        input_output_aliases={1: 1},
        scratch_shapes=[pltpu.VMEM((b, h), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 12 * h * h * n_layer,
            bytes_accessed=(12 * h * h * n_layer + 2 * kvf.size) * 2,
            transcendentals=n_layer * b * (max_len * num_heads + 4 * h),
        ),
    )(x, kvf, valid.T, offset.reshape(1, 1).astype(jnp.int32),
      *[a for a, _ in weight_args])
    return x_out, kvf_out


def kernel_path_supported(cfg, batch: int) -> bool:
    """Static (trace-time) gate for the flat-cache fused-step decode path:
    TPU (or forced interpret mode); the caller additionally requires plain
    (non-int8) weights."""
    from video_caption_tpu.ops.pallas.platform import on_tpu

    return on_tpu() and cfg.n_embd % cfg.n_head == 0 and (cfg.n_embd // cfg.n_head) % 8 == 0
