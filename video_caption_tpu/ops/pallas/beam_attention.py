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

Per (video-block, layer) the kernel runs the whole chain on-core: one loop
over heads (lane slices, the encoder kernel's pattern) computes prefill +
generated logits for the WHOLE block, applies the left-pad and ancestry
masks (built once, shared by all heads), softmaxes in f32 and contracts
against V. The layer index is STATIC per call (the step's layer loop is
python-unrolled), so the kernel takes the full stacked caches and
block-indexes its layer — no XLA-side slice materialization.

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
    """Per-HEAD loop over the whole video block (the encoder kernel's
    lane-slice pattern). The first version looped per VIDEO with
    head-blocked [K*nh, H] queries — full-H contractions cost 12x the dense
    FLOPs and measured 155us/call vs a ~60-70us DMA floor at bs=64
    (hlo_stats v5e 2026-08-18). Here the masks are built ONCE on [rb, *]
    rows (shared by all heads) and each head runs four well-shaped dots:
    [rb,hd] x [hd, vb*S0 | N*rb] logits and the transposed AV pair — real
    FLOPs only, no query expansion, no head-merge matmul.

    Masks stay strictly 2D via iota arithmetic + one-hot dots (Mosaic
    rejects the lane-dim shape casts the XLA path writes as reshapes).
    CRITICAL exactness rule: Mosaic's f32 dot multiplies in bf16-mantissa
    passes, so INTEGER-VALUED one-hot contractions are only exact for
    values <= 256. The ancestry expansion violated that at production batch
    (R=384: rows > 256 got rounded ancestries -> wrong attention masks,
    found 2026-08-18 vs the XLA path, max_abs 1.1); indices are now split
    into hi/lo < 128 components, expanded separately, and recombined in
    f32 — exact under any pass scheme. {0,1}-valued one-hot dots (the
    prefill-validity expansion) are exact as-is."""
    if deferred:
        knew_ref, vnew_ref, o_ref = refs
    else:
        (o_ref,) = refs
    t = t_ref[0]
    q = q_ref[:]                        # [rb = vb*K, H] bf16
    gkv = gkv_ref[:][0]                 # [N, 2, rb, H]
    pk = pk_ref[:][0]                   # [vb, S0, H]
    pv = pv_ref[:][0]
    h = q.shape[-1]
    rb = q.shape[0]
    dt = q.dtype
    hd = h // nh

    iv = pl.program_id(0)

    # flatten the caches over their MAJOR dims (layout-trivial: the merged
    # second-minor dims s0 and rb are sublane multiples)
    pkf = pk.reshape(vb * s0, h)        # [vb*S0, H]
    pvf = pv.reshape(vb * s0, h)
    gkf = gkv[:, 0].reshape(n * rb, h)  # [N*rb, H]
    gvf = gkv[:, 1].reshape(n * rb, h)

    # ---- prefill mask [rb, vb*S0], shared by all heads: row r (video r//K)
    # attends col c iff c//S0 == r//K and valid[c//S0, c%S0]
    cs = vb * s0
    valid01 = (valid_ref[:] > 0).astype(jnp.float32)             # [vb, S0]
    pos_onehot = (jax.lax.broadcasted_iota(jnp.int32, (s0, cs), 1) % s0 ==
                  jax.lax.broadcasted_iota(jnp.int32, (s0, cs), 0)
                  ).astype(jnp.float32)
    vx = jax.lax.dot_general(valid01, pos_onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [vb, cs]
    vid_c = jax.lax.broadcasted_iota(jnp.int32, (vb, cs), 1) // s0
    vm = vx * (vid_c == jax.lax.broadcasted_iota(jnp.int32, (vb, cs), 0)
               ).astype(jnp.float32)
    eq_vid = (jax.lax.broadcasted_iota(jnp.int32, (rb, vb), 0) // k ==
              jax.lax.broadcasted_iota(jnp.int32, (rb, vb), 1)
              ).astype(jnp.float32)
    mask_p = jax.lax.dot_general(eq_vid, vm, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) > 0.5

    # ---- gen mask [rb, N*rb]: col c = nn*rb + pr is attendable by row r
    # iff anc[r, nn] == row0_global + pr (the writer is this row's ancestor)
    # and nn <= t (< t in deferred mode — column t is stale; the self
    # column below covers it)
    cg = n * rb
    exp_nn = (jax.lax.broadcasted_iota(jnp.int32, (n, cg), 1) // rb ==
              jax.lax.broadcasted_iota(jnp.int32, (n, cg), 0)
              ).astype(jnp.float32)
    anc_i = anc_ref[:]                                           # [rb, N] i32
    anc_hi = (anc_i // 128).astype(jnp.float32)
    anc_lo = (anc_i % 128).astype(jnp.float32)
    anc_exp = 128.0 * jax.lax.dot_general(
        anc_hi, exp_nn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + jax.lax.dot_general(
        anc_lo, exp_nn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [rb, cg]
    col_pr = (jax.lax.broadcasted_iota(jnp.int32, (rb, cg), 1) % rb
              ).astype(jnp.float32)
    col_nn = jax.lax.broadcasted_iota(jnp.int32, (rb, cg), 1) // rb
    row0 = (iv * rb).astype(jnp.float32)
    t_ok = (col_nn < t) if deferred else (col_nn <= t)
    mask_g = (anc_exp == row0 + col_pr) & t_ok

    for hh in range(nh):
        sl = slice(hh * hd, (hh + 1) * hd)
        qh = q[:, sl]                                            # [rb, hd]
        lp = jax.lax.dot_general(
            qh, pkf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale          # [rb, cs]
        lp = jnp.where(mask_p, lp, _NEG)
        lg = jax.lax.dot_general(
            qh, gkf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale          # [rb, cg]
        lg = jnp.where(mask_g, lg, _NEG)
        m = jnp.maximum(lp.max(axis=-1, keepdims=True),
                        lg.max(axis=-1, keepdims=True))          # [rb, 1]
        if deferred:
            # self column: each row attends its OWN new K — a rowwise dot
            ls = jnp.sum(qh.astype(jnp.float32) *
                         knew_ref[:, sl].astype(jnp.float32),
                         axis=-1, keepdims=True) * scale         # [rb, 1]
            m = jnp.maximum(m, ls)
        ep = jnp.exp(lp - m)
        eg = jnp.exp(lg - m)
        denom = ep.sum(axis=-1, keepdims=True) + eg.sum(axis=-1, keepdims=True)
        if deferred:
            es = jnp.exp(ls - m)
            denom = denom + es
        inv = 1.0 / denom                                        # [rb, 1]
        out = jax.lax.dot_general(
            (ep * inv).astype(dt), pvf[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [rb, hd]
        out = out + jax.lax.dot_general(
            (eg * inv).astype(dt), gvf[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if deferred:
            out = out + (es * inv) * vnew_ref[:, sl].astype(jnp.float32)
        o_ref[:, sl] = out.astype(o_ref.dtype)


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
    # Video-block preference: larger vb = fewer, bigger kernel calls
    # (fuller sublane tiles, less per-call fixed overhead) at more VMEM
    # per step (the gen block is [N, 2, vb*k, H] bf16, double-buffered).
    # Env-tunable for on-chip A/B: VIDEO_CAPTION_BEAM_ATTN_VB.
    import os

    try:
        vb_pref = int(os.environ.get("VIDEO_CAPTION_BEAM_ATTN_VB", "8"))
    except ValueError:
        vb_pref = 8
    for cand in (vb_pref, 8, 4, 2, 1):
        if cand > 0 and b % cand == 0 and (cand * k) % 8 == 0:
            vb = cand
            break
    if vb is None:
        vb = b if (b * k) == r and r % 8 == 0 and b <= 8 else None
    if vb is None or h % 128:
        last_backend = "xla"
        return None
    # A time-blocked v2 variant (gen cache fetched in t-bounded blocks with
    # flash-style online-softmax accumulators) was built and A/B'd on chip
    # (2026-08-20, bs=64 beam group): 110.2 ms/iter hlo self-time vs 73.4 for
    # this kernel — the per-block fixed cost (accumulator rescale + grid
    # revisit) outweighed the saved masked-dead DMA/VPU work. Deleted per the
    # trunk_2d precedent; see BASELINE.md "beam-attention v2".
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
