"""Split-cache beam attention as a Pallas kernel — and, as importantly, a
LAYOUT ANCHOR for the generated-region KV cache.

The XLA form of the beam decode step (models/gpt2.py::_beam_attend) reads the
gen cache through dots whose free dims are (N, K); XLA's layout assignment
then wants N in the sublanes ({4,1,3,2,0} on the [L,N,2,R,H] carry,
hlo_stats v5e bs=64), which turns the per-step K/V slab write into a
read-modify-write of one sublane of every tile — 72 us x 12 layers x 24
steps = 21 ms of a 117 ms beam iteration, with another ~6 ms of relayout
copies around the attention einsums. A Pallas custom call pins its operands
to the DEFAULT layout, so routing the attention reads through this kernel
forces the scan carry to (R, H)-minor — the per-step dynamic_update_slice
then covers whole (8,128) tiles.

Per (video-block, layer) the kernel runs the whole chain on-core: expand
queries head-blocked ([K*nh, H] rows zeroed outside their own head's
H-slice, bit-zero cross-head terms — same trick as _beam_attend), compute
prefill + generated logits, apply the left-pad and ancestry masks, softmax
in f32, and contract against V. The layer index is STATIC per call (the
step's layer loop is python-unrolled), so the kernel takes the full stacked
caches and block-indexes its layer — no XLA-side slice materialization.

Numerics: f32 logit accumulation, -1e30 masking, f32 softmax — the same
formula as _beam_attend; dot order differs (per-video dots vs one batched
einsum), so outputs can differ by bf16 rounding. Interpret-mode tests pin
the kernel against the XLA path; the deployment alignment gate covers the
engine end-to-end.

Fallback contract (core/operators/cupy_vit_pool.py:139-152): returns None
off-TPU or for unsupported shapes; the caller uses the XLA path.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = logging.getLogger(__name__)

last_backend: Optional[str] = None
last_error: Optional[str] = None

_NEG = -1e30


def _kernel(t_ref, q_ref, gkv_ref, pk_ref, pv_ref, valid_ref, anc_ref,
            hmask_ref, *refs, layer: int, vb: int, k: int, nh: int,
            s0: int, n: int, scale: float, deferred: bool):
    if deferred:
        knew_ref, vnew_ref, o_ref = refs
    else:
        (o_ref,) = refs
    t = t_ref[0]
    q = q_ref[:]                        # [vb*K, H] bf16
    gkv = gkv_ref[:][0]                 # [N, 2, vb*K, H]
    pk = pk_ref[:][0]                   # [vb, S0, H]
    pv = pv_ref[:][0]
    valid = valid_ref[:]                # [vb, S0] i32
    anc = anc_ref[:]                    # [vb*K, N] i32
    hmask = hmask_ref[:]                # [nh, H] compute-dtype 0/1
    h = q.shape[-1]
    dt = q.dtype

    iv = pl.program_id(0)
    row0_global = iv * vb * k           # first global row of this block

    n_iota = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)      # [N, Kv]
    kv_iota = jax.lax.broadcasted_iota(jnp.int32, (n, k), 1)

    for v in range(vb):
        qv = q[v * k:(v + 1) * k, :]                             # [K, H]
        # head-blocked expansion: row (kq*nh + hh) is qv[kq] zeroed outside
        # head hh's H-slice
        q_exp = (qv[:, None, :] * hmask[None, :, :]).reshape(k * nh, h)

        lg_p = jax.lax.dot_general(
            q_exp, pk[v], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                # [K*nh, S0]
        lg_p = jnp.where((valid[v, :] > 0)[None, :], lg_p, _NEG)

        gk = gkv[:, 0, v * k:(v + 1) * k, :].reshape(n * k, h)   # [N*K, H]
        gv = gkv[:, 1, v * k:(v + 1) * k, :].reshape(n * k, h)
        lg_g = jax.lax.dot_general(
            q_exp, gk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                # [K*nh, N*K]

        # ancestry mask: query beam kq may attend gen column (nn, kv) iff
        # anc[row(kq), nn] == global_row(kv) and nn <= t (STRICTLY < t in
        # deferred mode — column t is stale; the self column covers it)
        anc_v = anc[v * k:(v + 1) * k, :]                        # [K, N]
        base = row0_global + v * k
        t_lim = n_iota[None, :, :] < t if deferred else n_iota[None, :, :] <= t
        sel = (anc_v[:, :, None] == (base + kv_iota)[None, :, :]) & t_lim
        sel_flat = sel.reshape(k, n * k)
        lg_g = lg_g.reshape(k, nh, n * k)
        lg_g = jnp.where(sel_flat[:, None, :], lg_g, _NEG).reshape(k * nh, n * k)

        parts = [lg_p, lg_g]
        if deferred:
            # self column: each row attends only its OWN new K (anc[:, t]
            # is the identity) — a rowwise dot over H
            kn = knew_ref[v * k:(v + 1) * k, :]                  # [K, H]
            kn_exp = jnp.broadcast_to(kn[:, None, :], (k, nh, h)).reshape(
                k * nh, h)
            ls = jnp.sum((q_exp * kn_exp).astype(jnp.float32), axis=-1,
                         keepdims=True) * scale                  # [K*nh, 1]
            parts.append(ls)
        attn = jax.nn.softmax(
            jnp.concatenate(parts, axis=-1), axis=-1
        ).astype(dt)                                             # [K*nh, S0+N*K(+1)]
        out = jax.lax.dot_general(
            attn[:, :s0], pv[v], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            attn[:, s0:s0 + n * k], gv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # [K*nh, H]
        if deferred:
            vn = vnew_ref[v * k:(v + 1) * k, :]                  # [K, H]
            vn_exp = jnp.broadcast_to(vn[:, None, :], (k, nh, h)).reshape(
                k * nh, h)
            out = out + attn[:, s0 + n * k:].astype(jnp.float32) * \
                vn_exp.astype(jnp.float32)
        # keep each row's own head block, re-merge heads
        res = (out.reshape(k, nh, h) * hmask[None, :, :]).sum(axis=1)
        o_ref[v * k:(v + 1) * k, :] = res.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("layer", "k", "nh", "vb"))
def _run(t_arr, q, gkv, pk, pv, valid, anc, hmask, layer: int, k: int,
         nh: int, vb: int, k_new=None, v_new=None):
    r, h = q.shape
    n = gkv.shape[1]
    b, s0 = valid.shape
    deferred = k_new is not None
    kern = partial(_kernel, layer=layer, vb=vb, k=k, nh=nh, s0=s0, n=n,
                   scale=(h // nh) ** -0.5, deferred=deferred)
    grid = (b // vb,)
    rb = vb * k
    in_specs = [
        pl.BlockSpec((rb, h), lambda iv, t: (iv, 0)),
        # full stacked caches; the layer picks its block statically
        pl.BlockSpec((1, n, 2, rb, h), lambda iv, t: (layer, 0, 0, iv, 0)),
        pl.BlockSpec((1, vb, s0, h), lambda iv, t: (layer, iv, 0, 0)),
        pl.BlockSpec((1, vb, s0, h), lambda iv, t: (layer, iv, 0, 0)),
        pl.BlockSpec((vb, s0), lambda iv, t: (iv, 0)),
        pl.BlockSpec((rb, n), lambda iv, t: (iv, 0)),
        pl.BlockSpec((nh, h), lambda iv, t: (0, 0)),
    ]
    args = [t_arr, q, gkv, pk, pv, valid, anc, hmask]
    if deferred:
        in_specs += [pl.BlockSpec((rb, h), lambda iv, t: (iv, 0)),
                     pl.BlockSpec((rb, h), lambda iv, t: (iv, 0))]
        args += [k_new, v_new]
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((rb, h), lambda iv, t: (iv, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((r, h), q.dtype),
    )(*args)


def beam_gen_attention(
    q: jax.Array,            # [R, H] this layer's queries (R = B*K)
    gkv_all: jax.Array,      # [L, N, 2, R, H] stacked gen cache (post-write)
    pk_all: jax.Array,       # [L, B, S0, H] stacked prefill K
    pv_all: jax.Array,       # [L, B, S0, H]
    prefill_valid: jax.Array,  # [B, S0] int32
    anc: jax.Array,          # [R, N] int32 ancestry (global row per column)
    t: jax.Array,            # scalar int32 current step
    hmask: jax.Array,        # [nh, H] head-block mask in compute dtype
    layer: int,
    num_beams: int,
    nh: int,
    k_new: Optional[jax.Array] = None,  # [R, H] deferred-write mode: this
    v_new: Optional[jax.Array] = None,  # step's K/V (cache column t stale)
) -> Optional[jax.Array]:
    """Attention output [R, H] for one layer of the beam decode step, or
    None (fallback to the XLA _beam_attend path)."""
    global last_backend, last_error
    from video_caption_tpu.ops.pallas.platform import on_tpu

    if not on_tpu():
        last_backend = "xla"
        return None
    r, h = q.shape
    b = prefill_valid.shape[0]
    k = num_beams
    vb = None
    for cand in (8, 4, 2, 1):
        if b % cand == 0 and (cand * k) % 8 == 0:
            vb = cand
            break
    if vb is None:
        vb = b if (b * k) == r and r % 8 == 0 and b <= 8 else None
    if vb is None or h % 128:
        last_backend = "xla"
        return None
    try:
        t_arr = jnp.asarray(t, jnp.int32).reshape(1)
        kn = None if k_new is None else k_new.astype(q.dtype)
        vn = None if v_new is None else v_new.astype(q.dtype)
        out = _run(t_arr, q, gkv_all, pk_all, pv_all,
                   prefill_valid.astype(jnp.int32), anc.astype(jnp.int32),
                   hmask.astype(q.dtype), layer, k, nh, vb,
                   k_new=kn, v_new=vn)
        last_backend = "pallas"
        return out
    except Exception as exc:
        last_backend = "xla"
        last_error = f"{type(exc).__name__}: {exc}"
        log.warning("beam_gen_attention kernel unavailable (%s)", last_error)
        return None
