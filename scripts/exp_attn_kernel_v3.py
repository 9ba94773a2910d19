"""Retile/reschedule experiments on the encoder-attention kernel (VERDICT r3 #1).

The kernel runs at ~21% effective FLOPs (35 ms of a 323 ms bs=64 encode).
Budget per (layer, program) at g=8: 22.8us measured vs ~5us roofline.
Hypothesis: the per-head matmul->softmax->matmul chain serializes MXU and
VPU — the f32 softmax over [G,197,197] costs about as much VPU time as the
two MXU matmuls, and nothing overlaps them.

Variants (attention op alone, [N,S,3H] -> [N,S,H], N=1024 bf16):
  base        current production kernel
  pipelined   software-pipelined head loop: issue head i's QK^T before
              head i-1's softmax/AV so the scheduler can overlap MXU/VPU
  recip       softmax via exp * reciprocal(sum) instead of divide
  exp_bf16    exp + normalize in bf16 after f32 max-subtract (the result is
              cast to bf16 for the AV matmul anyway); max|dev| printed
  headgrid    grid (n/g, nh/2): one head-pair per step, out blocks are full
              128-lane tiles, qkv block constant across the minor grid dim
  g16         base kernel at g=16

Usage: python scripts/exp_attn_kernel_v3.py [n_frames] [trials]
"""
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
S, NH, HD = 197, 12, 64
H = NH * HD
VMEM = 100 * 1024 * 1024

rng = np.random.RandomState(0)
qkv = jnp.asarray(rng.randn(N, S, 3 * H).astype(np.float32) * 0.3, jnp.bfloat16)
jax.block_until_ready(qkv)


def run(name, fn, ref=None):
    f = jax.jit(fn)
    out = f(qkv)
    np.asarray(out[0, 0, 0])   # sync-by-transfer: block_until_ready is not a
    # barrier on this runtime (round-2 finding, bench.py)
    meds = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(TRIALS):
            out = f(qkv)
        np.asarray(out[0, 0, 0])
        meds.append((time.perf_counter() - t0) * 1e3 / TRIALS)
    med = statistics.median(meds)
    ts = meds
    flops = 4 * N * NH * S * S * HD
    eff = flops / (med / 1e3) / 197e12 * 100
    dev = ""
    if ref is not None:
        d = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        dev = f"  max|dev|={d:.2e}"
    print(f"{name:12s} {med:7.3f} ms  ({eff:5.1f}% peak FLOPs, x12 layers = {med*12:6.1f} ms){dev}",
          flush=True)
    return med, out


# ---- base (production kernel) ----
from video_caption_tpu.ops.pallas.encoder_attention import (  # noqa: E402
    _attn_qkv_kernel, _batched_attention)

t_base, ref = run("base", lambda x: _batched_attention(x, NH, 8))


# ---- pipelined head loop ----
def _kern_pipelined(qkv_ref, o_ref, *, nh, hd, scale):
    blk = qkv_ref[:]
    h = nh * hd

    def qk(hi):
        q = blk[:, :, hi * hd:(hi + 1) * hd]
        k = blk[:, :, h + hi * hd:h + (hi + 1) * hd]
        return jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32) * scale

    def av(hi, attn):
        v = blk[:, :, 2 * h + hi * hd:2 * h + (hi + 1) * hd]
        o_ref[:, :, hi * hd:(hi + 1) * hd] = jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    logits = qk(0)
    for hi in range(nh):
        attn = jax.nn.softmax(logits, axis=-1).astype(blk.dtype)
        if hi + 1 < nh:
            logits = qk(hi + 1)   # issue next head's MXU work before this AV
        av(hi, attn)


def pipelined(x, g=8):
    kern = partial(_kern_pipelined, nh=NH, hd=HD, scale=HD ** -0.5)
    return pl.pallas_call(
        kern, grid=(N // g,),
        in_specs=[pl.BlockSpec((g, S, 3 * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, S, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, H), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
        cost_estimate=pl.CostEstimate(flops=4 * N * NH * S * S * HD,
                                      bytes_accessed=x.size * 2 * 4 // 3,
                                      transcendentals=N * NH * S * S),
    )(x)


run("pipelined", pipelined, ref)


# ---- reciprocal softmax ----
def _softmax_recip(logits, dtype):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    return (e * pl.reciprocal(s, approx=False)).astype(dtype)


def _kern_recip(qkv_ref, o_ref, *, nh, hd, scale, approx):
    blk = qkv_ref[:]
    h = nh * hd
    for hi in range(nh):
        q = blk[:, :, hi * hd:(hi + 1) * hd]
        k = blk[:, :, h + hi * hd:h + (hi + 1) * hd]
        v = blk[:, :, 2 * h + hi * hd:2 * h + (hi + 1) * hd]
        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        attn = (e * pl.reciprocal(s, approx=approx)).astype(blk.dtype)
        o_ref[:, :, hi * hd:(hi + 1) * hd] = jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def recip(x, approx=False, g=8):
    kern = partial(_kern_recip, nh=NH, hd=HD, scale=HD ** -0.5, approx=approx)
    return pl.pallas_call(
        kern, grid=(N // g,),
        in_specs=[pl.BlockSpec((g, S, 3 * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, S, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, H), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )(x)


run("recip", recip, ref)
run("recip_approx", lambda x: recip(x, approx=True), ref)


# ---- bf16 exp/normalize ----
def _kern_bf16exp(qkv_ref, o_ref, *, nh, hd, scale):
    blk = qkv_ref[:]
    h = nh * hd
    for hi in range(nh):
        q = blk[:, :, hi * hd:(hi + 1) * hd]
        k = blk[:, :, h + hi * hd:h + (hi + 1) * hd]
        v = blk[:, :, 2 * h + hi * hd:2 * h + (hi + 1) * hd]
        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - m).astype(jnp.bfloat16))
        s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        attn = (e * pl.reciprocal(s, approx=False).astype(jnp.bfloat16))
        o_ref[:, :, hi * hd:(hi + 1) * hd] = jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def bf16exp(x, g=8):
    kern = partial(_kern_bf16exp, nh=NH, hd=HD, scale=HD ** -0.5)
    return pl.pallas_call(
        kern, grid=(N // g,),
        in_specs=[pl.BlockSpec((g, S, 3 * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, S, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, H), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )(x)


run("exp_bf16", bf16exp, ref)


# ---- head-pair grid ----
def _kern_headgrid(qkv_ref, o_ref, *, hd, scale, heads_per_step):
    blk = qkv_ref[:]          # [G, S, 3H] (full qkv row block)
    h = NH * hd
    hp = pl.program_id(1)
    for j in range(heads_per_step):
        off = (hp * heads_per_step + j) * hd
        q = jax.lax.dynamic_slice_in_dim(blk, off, hd, axis=2)
        k = jax.lax.dynamic_slice_in_dim(blk, h + off, hd, axis=2)
        v = jax.lax.dynamic_slice_in_dim(blk, 2 * h + off, hd, axis=2)
        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=-1).astype(blk.dtype)
        o_ref[:, :, j * hd:(j + 1) * hd] = jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def headgrid(x, g=8, hps=2):
    kern = partial(_kern_headgrid, hd=HD, scale=HD ** -0.5, heads_per_step=hps)
    return pl.pallas_call(
        kern, grid=(N // g, NH // hps),
        in_specs=[pl.BlockSpec((g, S, 3 * H), lambda i, hp: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, S, hps * HD), lambda i, hp: (i, 0, hp),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, H), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )(x)


run("headgrid", headgrid, ref)
run("headgrid_g16", lambda x: headgrid(x, g=16), ref)

# ---- base at g=16 ----
run("g16", lambda x: _batched_attention(x, NH, 16), ref)

# ---- best-combo candidates measured after first results ----
def _kern_pipe_recip_bf16(qkv_ref, o_ref, *, nh, hd, scale):
    blk = qkv_ref[:]
    h = nh * hd

    def qk(hi):
        q = blk[:, :, hi * hd:(hi + 1) * hd]
        k = blk[:, :, h + hi * hd:h + (hi + 1) * hd]
        return jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32) * scale

    logits = qk(0)
    for hi in range(nh):
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - m).astype(jnp.bfloat16))
        s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        attn = e * pl.reciprocal(s, approx=False).astype(jnp.bfloat16)
        if hi + 1 < nh:
            logits = qk(hi + 1)
        v = blk[:, :, 2 * h + hi * hd:2 * h + (hi + 1) * hd]
        o_ref[:, :, hi * hd:(hi + 1) * hd] = jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pipe_recip_bf16(x, g=8):
    kern = partial(_kern_pipe_recip_bf16, nh=NH, hd=HD, scale=HD ** -0.5)
    return pl.pallas_call(
        kern, grid=(N // g,),
        in_specs=[pl.BlockSpec((g, S, 3 * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, S, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, H), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )(x)


run("pipe+bf16exp", pipe_recip_bf16, ref)
