"""A/B the beam-attention kernel structure at production shapes.

Current kernel (_kernel in ops/pallas/beam_attention.py): per-VIDEO loop,
HEAD-BLOCKED queries ([K*nh, H] rows, full-H contractions = 12x dense
FLOPs to avoid per-head slices). hlo_stats (v5e bs=64): 155 us/call vs a
~60-70 us DMA floor — compute-bound.

Variant B: per-HEAD loop over the WHOLE video block (the encoder kernel's
lane-slice pattern): masks are built ONCE on [rb, *] (not [K*nh, *]), each
head runs 4 well-shaped dots ([rb,64]x[64, vb*s0|N*rb]), real FLOPs only.

Usage: python scripts/exp_beam_attn_kernel.py [batch(videos*presets)] [trials]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128   # videos x beam presets
trials = int(sys.argv[2]) if len(sys.argv) > 2 else 50

K = 3
NH = 12
HD = 64
H = NH * HD
S0 = 48
N = 24
L = 12
R = B * K
VB = 8
NEG = -1e30

rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(R, H), jnp.bfloat16)
gkv = jnp.asarray(rng.randn(L, N, 2, R, H), jnp.bfloat16)
pk = jnp.asarray(rng.randn(L, B, S0, H), jnp.bfloat16)
pv = jnp.asarray(rng.randn(L, B, S0, H), jnp.bfloat16)
valid = jnp.ones((B, S0), jnp.int32)
anc_np = np.zeros((R, N), np.int32)
for r in range(R):
    base = (r // K) * K
    anc_np[r] = base + rng.randint(0, K, N)
    anc_np[r, 12] = r
anc = jnp.asarray(anc_np)
t_step = jnp.asarray([12], jnp.int32)
jax.block_until_ready((q, gkv, pk, pv))

from video_caption_tpu.ops.pallas.beam_attention import _run as run_a


# ---------------- variant B ----------------------------------------------
def _kernel_b(t_ref, q_ref, gkv_ref, pk_ref, pv_ref, valid_ref, anc_ref,
              o_ref, *, layer, vb, k, nh, s0, n, scale):
    t = t_ref[0]
    qb = q_ref[:]                               # [rb, H]
    gkv_blk = gkv_ref[:][0]                     # [N, 2, rb, H]
    rb = qb.shape[0]
    h = qb.shape[1]
    hd = h // nh
    pkf = pk_ref[:][0].reshape(vb * s0, h)      # [vb*S0, H] (major merge)
    pvf = pv_ref[:][0].reshape(vb * s0, h)
    gkf = gkv_blk[:, 0].reshape(n * rb, h)      # [N*rb, H]
    gvf = gkv_blk[:, 1].reshape(n * rb, h)
    valid01 = (valid_ref[:] > 0).astype(jnp.float32)   # [vb, s0]
    ancf = anc_ref[:].astype(jnp.float32)       # [rb, N]
    iv = pl.program_id(0)
    row0 = (iv * rb).astype(jnp.float32)

    # ---- masks shared by all heads (rows = rb, built once) ----
    # prefill: row r (video r//k) may attend col c iff c//s0 == r//k and
    # valid[c//s0, c%s0]
    cs = vb * s0
    posP = (jax.lax.broadcasted_iota(jnp.int32, (s0, cs), 1) % s0 ==
            jax.lax.broadcasted_iota(jnp.int32, (s0, cs), 0)).astype(jnp.float32)
    vx = jax.lax.dot_general(valid01, posP, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [vb, cs]
    vidc = jax.lax.broadcasted_iota(jnp.int32, (vb, cs), 1) // s0
    vm = vx * (vidc == jax.lax.broadcasted_iota(jnp.int32, (vb, cs), 0)
               ).astype(jnp.float32)
    eq_vid = (jax.lax.broadcasted_iota(jnp.int32, (rb, vb), 0) // k ==
              jax.lax.broadcasted_iota(jnp.int32, (rb, vb), 1)).astype(jnp.float32)
    mask_p = jax.lax.dot_general(eq_vid, vm, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) > 0.5

    # gen: row r may attend col c = nn*rb + pr iff anc[r, nn] == row0 + pr
    # and nn <= t
    cg = n * rb
    expE = (jax.lax.broadcasted_iota(jnp.int32, (n, cg), 1) // rb ==
            jax.lax.broadcasted_iota(jnp.int32, (n, cg), 0)).astype(jnp.float32)
    # EXACT one-hot expansion: Mosaic's f32 dot multiplies in bf16-mantissa
    # passes, so integer values > 256 round (production bug found 2026-08-18:
    # row-303 ancestry corrupted at R=384). Split the index into hi/lo < 128
    # components (each exact under any pass scheme), expand separately and
    # recombine in f32.
    anc_i = anc_ref[:]
    anc_hi = (anc_i // 128).astype(jnp.float32)
    anc_lo = (anc_i % 128).astype(jnp.float32)
    anc_exp = 128.0 * jax.lax.dot_general(
        anc_hi, expE, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + jax.lax.dot_general(
        anc_lo, expE, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [rb, cg]
    col_pr = (jax.lax.broadcasted_iota(jnp.int32, (rb, cg), 1) % rb
              ).astype(jnp.float32)
    col_nn = jax.lax.broadcasted_iota(jnp.int32, (rb, cg), 1) // rb
    mask_g = (anc_exp == row0 + col_pr) & (col_nn <= t)

    dt = qb.dtype
    for hh in range(nh):
        sl = slice(hh * hd, (hh + 1) * hd)
        qh = qb[:, sl]                          # [rb, hd]
        lp = jax.lax.dot_general(
            qh, pkf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # [rb, cs]
        lp = jnp.where(mask_p, lp, NEG)
        lg = jax.lax.dot_general(
            qh, gkf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # [rb, cg]
        lg = jnp.where(mask_g, lg, NEG)
        m = jnp.maximum(lp.max(axis=-1, keepdims=True),
                        lg.max(axis=-1, keepdims=True))
        ep = jnp.exp(lp - m)
        eg = jnp.exp(lg - m)
        inv = 1.0 / (ep.sum(axis=-1, keepdims=True) + eg.sum(axis=-1, keepdims=True))
        out = jax.lax.dot_general(
            (ep * inv).astype(dt), pvf[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + jax.lax.dot_general(
            (eg * inv).astype(dt), gvf[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:, sl] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("layer", "k", "nh", "vb"))
def run_b(t_arr, q, gkv, pk, pv, valid, anc, layer, k, nh, vb):
    r, h = q.shape
    n = gkv.shape[1]
    b, s0 = valid.shape
    kern = partial(_kernel_b, layer=layer, vb=vb, k=k, nh=nh, s0=s0, n=n,
                   scale=(h // nh) ** -0.5)
    rb = vb * k
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // vb,),
            in_specs=[
                pl.BlockSpec((rb, h), lambda iv, t: (iv, 0)),
                pl.BlockSpec((1, n, 2, rb, h), lambda iv, t: (layer, 0, 0, iv, 0)),
                pl.BlockSpec((1, vb, s0, h), lambda iv, t: (layer, iv, 0, 0)),
                pl.BlockSpec((1, vb, s0, h), lambda iv, t: (layer, iv, 0, 0)),
                pl.BlockSpec((vb, s0), lambda iv, t: (iv, 0)),
                pl.BlockSpec((rb, n), lambda iv, t: (iv, 0)),
            ],
            out_specs=pl.BlockSpec((rb, h), lambda iv, t: (iv, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((r, h), q.dtype),
    )(t_arr, q, gkv, pk, pv, valid, anc)


def timed(name, fn):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:14s} {statistics.median(ts):7.3f} ms/call  (min {min(ts):.3f})")
    return out


oa = timed("A current", lambda: run_a(t_step, q, gkv, pk, pv, valid, anc, 3, K, NH, VB))
ob = timed("B head-loop", lambda: run_b(t_step, q, gkv, pk, pv, valid, anc, 3, K, NH, VB))
d = float(jnp.max(jnp.abs(oa.astype(jnp.float32) - ob.astype(jnp.float32))))
s = float(jnp.max(jnp.abs(oa.astype(jnp.float32))))
print(f"max abs dev A vs B: {d:.3e}  (scale {s:.2f})")

# chain both over 12 layers to approximate per-step cost
def chain(run):
    def f():
        outs = [run(t_step, q, gkv, pk, pv, valid, anc, l, K, NH, VB)
                for l in range(L)]
        return outs
    return f

timed("A x12 layers", chain(run_a))
timed("B x12 layers", chain(run_b))

# ---- exact XLA reference (production fallback path) ----------------------
from video_caption_tpu.models.gpt2 import GPT2Config, _beam_attend, ancestry_mask, head_block_mask

cfg = GPT2Config(use_pallas_beam_attention=False, use_pallas_lm_head=False)
layer = 3
sel = ancestry_mask(anc, B, K, t_step[0])
hmask = head_block_mask(cfg)


@jax.jit
def ref(q, pk_l, pv_l, gk_l, gv_l, valid, sel):
    return _beam_attend(q, pk_l, pv_l, gk_l, gv_l, valid, sel, hmask, K, cfg)


orf = ref(q, pk[layer], pv[layer], gkv[layer, :, 0], gkv[layer, :, 1], valid, sel)
for name, o in (("A", oa), ("B", ob)):
    dv = jnp.abs(o.astype(jnp.float32) - orf.astype(jnp.float32))
    i = jnp.unravel_index(jnp.argmax(dv), dv.shape)
    print(f"{name} vs XLA: max abs {float(jnp.max(dv)):.3e} at row {int(i[0])}")
