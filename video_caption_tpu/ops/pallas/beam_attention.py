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
            *refs, layer: int, vb: int, k: int, nh: int,
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
    h = q.shape[-1]
    dt = q.dtype
    hd = h // nh
    kn2 = k * nh

    iv = pl.program_id(0)
    row0_global = iv * vb * k           # first global row of this block

    # Everything below stays strictly 2D. The expand/merge steps the XLA
    # path writes as reshapes — (K,nh,H)<->(K*nh,H), (N,K,H)->(N*K,H), and
    # the (K,N,K)->(K,N*K) ancestry-mask flatten — are vector shape casts
    # Mosaic refuses on these minor-dim shapes (v5e aborted compilation
    # with "infer-vector-layout: unsupported shape cast" on the i1 one).
    # Instead: iota arithmetic for masks and one-hot matmuls for the
    # row expansions/merges. Each one-hot contraction has exactly one
    # nonzero term per output element, so it is bit-exact.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (kn2, h), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (kn2, h), 1)
    hmask_rep = col_i // hd == row_i % nh              # [K*nh, H] head blocks
    eq = (jax.lax.broadcasted_iota(jnp.int32, (kn2, k), 0) // nh ==
          jax.lax.broadcasted_iota(jnp.int32, (kn2, k), 1)
          ).astype(jnp.float32)                        # [K*nh, K] one-hot
    eq_t = (jax.lax.broadcasted_iota(jnp.int32, (k, kn2), 1) // nh ==
            jax.lax.broadcasted_iota(jnp.int32, (k, kn2), 0)
            ).astype(jnp.float32)                      # [K, K*nh] one-hot
    nn_i = jax.lax.broadcasted_iota(jnp.int32, (kn2, n), 1)      # [K*nh, N]
    # STRICTLY < t in deferred mode — column t is stale; the self column
    # appended below covers it
    t_ok = (nn_i < t) if deferred else (nn_i <= t)

    def expand_rows(xk):
        """[K, H] -> [K*nh, H] f32; row kq*nh+hh carries xk[kq] (exact)."""
        return jax.lax.dot_general(
            eq, xk.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for v in range(vb):
        qv = q[v * k:(v + 1) * k, :]                             # [K, H]
        # head-blocked expansion: row (kq*nh + hh) is qv[kq] zeroed outside
        # head hh's H-slice
        q_exp = jnp.where(hmask_rep, expand_rows(qv), 0.0).astype(dt)

        lg_p = jax.lax.dot_general(
            q_exp, pk[v], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                # [K*nh, S0]
        lg_p = jnp.where((valid[v, :] > 0)[None, :], lg_p, _NEG)

        # ancestry expanded to query rows: anc_rep[row, nn] = anc[row//nh, nn]
        # (row indices < R <= a few hundred — exact in f32)
        anc_rep = jax.lax.dot_general(
            eq, anc[v * k:(v + 1) * k, :].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [K*nh, N]
        base = row0_global + v * k

        # generated region, one 2D slab per beam slot kv: query beam kq may
        # attend slot kv's gen column nn iff anc[kq, nn] == base + kv.
        # The parts are NEVER concatenated — Mosaic rejects lane-misaligned
        # tpu.concatenate (S0/N offsets aren't 128-multiples) — the softmax
        # runs jointly across parts via a shared row max + partial sums
        # (same x-max/exp/normalize formula; denominator summation order
        # differs from a flat softmax by f32 rounding only).
        parts = [lg_p]
        gvs = []
        for kv in range(k):
            gk_kv = gkv[:, 0, v * k + kv, :]                     # [N, H]
            gvs.append(gkv[:, 1, v * k + kv, :])
            lg_kv = jax.lax.dot_general(
                q_exp, gk_kv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                            # [K*nh, N]
            sel_kv = (anc_rep == (base + kv).astype(jnp.float32)) & t_ok
            parts.append(jnp.where(sel_kv, lg_kv, _NEG))
        if deferred:
            # self column: each row attends only its OWN new K (anc[:, t]
            # is the identity) — a rowwise dot over H
            kn_exp = expand_rows(knew_ref[v * k:(v + 1) * k, :])
            ls = jnp.sum(q_exp.astype(jnp.float32) * kn_exp, axis=-1,
                         keepdims=True) * scale                  # [K*nh, 1]
            parts.append(ls)
        m = parts[0].max(axis=-1, keepdims=True)
        for p in parts[1:]:
            m = jnp.maximum(m, p.max(axis=-1, keepdims=True))    # [K*nh, 1]
        exps = [jnp.exp(p - m) for p in parts]
        denom = exps[0].sum(axis=-1, keepdims=True)
        for e in exps[1:]:
            denom = denom + e.sum(axis=-1, keepdims=True)
        inv = 1.0 / denom                                        # [K*nh, 1]
        out = jax.lax.dot_general(
            (exps[0] * inv).astype(dt), pv[v], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [K*nh, H]
        for kv in range(k):
            out = out + jax.lax.dot_general(
                (exps[1 + kv] * inv).astype(dt), gvs[kv],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if deferred:
            vn_exp = expand_rows(vnew_ref[v * k:(v + 1) * k, :])
            out = out + (exps[-1] * inv).astype(dt).astype(jnp.float32) * vn_exp
        # keep each row's own head block, re-merge heads (one nonzero row
        # per output element after the mask -> exact)
        out = jnp.where(hmask_rep, out, 0.0)
        res = jax.lax.dot_general(
            eq_t, out, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [K, H]
        o_ref[v * k:(v + 1) * k, :] = res.astype(o_ref.dtype)


_probe_ok: dict = {}


def _compile_probe(deferred: bool) -> bool:
    """Eagerly compile the kernel once at tiny shapes before it is ever
    traced into a real program. Mosaic lowering failures surface at the
    ENCLOSING program's compile — after tracing, outside any try/except
    around the traced call — so the trace-time fallback contract alone
    cannot catch them (the hw-session smoke caught exactly this: an
    interpret-green kernel aborting the whole beam program's compile).
    Systematic lowering failures are shape-independent and show up here;
    on failure the kernel reports unavailable and callers take the XLA
    path. Costs one tiny compile per process and mode."""
    from video_caption_tpu.ops.pallas.platform import _interpret_mode_forced
    if _interpret_mode_forced():
        return True
    key = bool(deferred)
    if key in _probe_ok:
        return _probe_ok[key]
    global last_error
    try:
        k, nh, h, vb, b, s0, n = 2, 2, 256, 4, 4, 8, 8
        r = b * k
        z = lambda shape: jnp.zeros(shape, jnp.bfloat16)  # noqa: E731
        out = _run(
            jnp.zeros((1,), jnp.int32), z((r, h)), z((2, n, 2, r, h)),
            z((2, b, s0, h)), z((2, b, s0, h)),
            jnp.ones((b, s0), jnp.int32), jnp.zeros((r, n), jnp.int32),
            0, k, nh, vb,
            k_new=z((r, h)) if deferred else None,
            v_new=z((r, h)) if deferred else None)
        jax.block_until_ready(out)
        _probe_ok[key] = True
    except Exception as exc:
        last_error = f"probe {type(exc).__name__}: {exc}"
        log.warning("beam_gen_attention compile probe failed (%s)", last_error)
        _probe_ok[key] = False
    return _probe_ok[key]


@partial(jax.jit, static_argnames=("layer", "k", "nh", "vb"))
def _run(t_arr, q, gkv, pk, pv, valid, anc, layer: int, k: int,
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
    ]
    args = [t_arr, q, gkv, pk, pv, valid, anc]
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
    hmask: jax.Array,        # [nh, H] head-block mask (unused: the kernel
                             # rebuilds it from iota; kept for caller compat)
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
    if not _compile_probe(k_new is not None):
        last_backend = "xla"
        return None
    try:
        t_arr = jnp.asarray(t, jnp.int32).reshape(1)
        kn = None if k_new is None else k_new.astype(q.dtype)
        vn = None if v_new is None else v_new.astype(q.dtype)
        out = _run(t_arr, q, gkv_all, pk_all, pv_all,
                   prefill_valid.astype(jnp.int32), anc.astype(jnp.int32),
                   layer, k, nh, vb,
                   k_new=kn, v_new=vn)
        last_backend = "pallas"
        return out
    except Exception as exc:
        last_backend = "xla"
        last_error = f"{type(exc).__name__}: {exc}"
        log.warning("beam_gen_attention kernel unavailable (%s)", last_error)
        return None
