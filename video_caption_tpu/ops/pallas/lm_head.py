"""Fused LM-head + selection statistics kernel.

The decode step's selection pipeline needs, besides the logits themselves,
three reductions over the [R, V] buffer: per-128-token window maxima (the
first stage of the exact top-k), the row max, and the row sum-exp (the beam
path's log-softmax shift). Computed separately in XLA each is another pass
over the 77 MB buffer, and the window reduce forces TWO layout-transposing
copies of it per decode step inside the scan (copy.1711/1713 + reduce_max,
~350 us/step at [384, 50304] — hlo_stats v5e bs=64): any [B, W, 128] view
of a row-major [B, V] buffer re-tiles it, so XLA cannot fuse the windowed
reduction with the matmul.

This kernel runs the LM-head matmul ``x @ wte_t`` in V-chunks and computes
all three statistics on each chunk while it is live in VMEM — the [R, V]
buffer is written ONCE (row-major, the layout every downstream consumer of
raw logits wants) and never re-read for statistics. The row sum-exp uses the
online-softmax rescale across chunks; its summation order therefore differs
from a flat XLA reduce by f32 rounding (documented deviation — the shift is
uniform per row, so the relative order of a row's candidates is unchanged).

Fallback contract (core/operators/cupy_vit_pool.py:139-152): returns None
off-TPU / on unsupported shapes and the caller computes the same values with
plain XLA ops.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = logging.getLogger(__name__)

last_backend: Optional[str] = None
last_error: Optional[str] = None

WINDOW = 128                      # one lane tile per window


def _kernel(x_ref, w_ref, logits_ref, wmax_ref, m_ref, l_ref, *,
            vocab_size: int, v_chunk: int, n_chunks: int):
    iv = pl.program_id(0)
    x = x_ref[:]                                   # [R, H]
    w = w_ref[:]                                   # [H, vC]
    lg = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # [R, vC] f32
    r = lg.shape[0]
    # mask the global pad columns (>= vocab_size) to -inf
    col = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1) + iv * v_chunk
    lg = jnp.where(col < vocab_size, lg, float("-inf"))
    logits_ref[:] = lg
    # per-window maxima: minor-dim split is layout-free inside the kernel.
    # The output buffer is TRANSPOSED [W_pad, R] and written with a
    # LEADING-dim dynamic store (Mosaic lowers dynamic stores on the leading
    # dim only, and the offset must be provably 8-aligned — hence each
    # chunk's rows are padded to a sublane multiple ``nw_pad``)
    nw_c = v_chunk // WINDOW
    nw_pad = -(-nw_c // 8) * 8
    wm = jnp.max(lg.reshape(r, nw_c, WINDOW), axis=-1)       # [R, nw_c]
    wm_t = jnp.pad(wm.T, ((0, nw_pad - nw_c), (0, 0)),
                   constant_values=float("-inf"))            # [nw_pad, R]
    wmax_ref[pl.ds(pl.multiple_of(iv * nw_pad, nw_pad), nw_pad), :] = wm_t
    # online row max / sum-exp across chunks (m/l blocks stay VMEM-resident
    # over the whole iv sweep; written back after the last chunk)
    cm = jnp.max(lg, axis=-1, keepdims=True)       # [R, 1]
    cl = jnp.sum(jnp.exp(lg - cm), axis=-1, keepdims=True)

    @pl.when(iv == 0)
    def _init():
        m_ref[:] = cm
        l_ref[:] = cl

    @pl.when(iv > 0)
    def _update():
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, cm)
        l_ref[:] = l_ref[:] * jnp.exp(m_old - m_new) + cl * jnp.exp(cm - m_new)
        m_ref[:] = m_new


def _chunking(vp: int, r: int, h: int = 768):
    """(n_chunks, v_chunk): a 128-multiple divisor of vp whose VMEM stack
    footprint fits the 16 MB scoped limit. The estimate is calibrated
    against the compiler's own accounting (v5e reported 17.04M for
    r=576/vc=1408: double-buffered wte + logits blocks, ~3 logits-sized
    live buffers, 2 x-sized, the sweep-resident wmax block): the grouped
    decode's r=384/vc=1408 fits, the unified program's r=576 needs a
    narrower chunk — without this, the kernel VMEM-OOMs the whole unified
    compile."""
    for cand in (1408, 1152, 1536, 2816, 1024, 896, 768, 512, 384, 256, 128):
        if vp % cand:
            continue
        n_chunks = vp // cand
        nw_pad = -(-(cand // WINDOW) // 8) * 8
        est = (2 * h * cand * 2 + 3 * r * cand * 4 + 2 * r * h * 2 +
               n_chunks * nw_pad * r * 4 + (1 << 20))
        if est <= int(14.5 * (1 << 20)):
            return n_chunks, cand
    return None, None


_probe_ok: Optional[bool] = None


def _compile_probe() -> bool:
    """Eagerly compile the kernel once at tiny shapes (see
    beam_attention._compile_probe: Mosaic lowering failures surface at the
    enclosing program's compile where the trace-time fallback cannot catch
    them). One tiny compile per process."""
    from video_caption_tpu.ops.pallas.platform import _interpret_mode_forced
    if _interpret_mode_forced():
        return True
    global _probe_ok, last_error
    if _probe_ok is not None:
        return _probe_ok
    try:
        out = _run(jnp.zeros((8, 128), jnp.bfloat16),
                   jnp.zeros((128, 256), jnp.bfloat16), 250)
        jax.block_until_ready(out)
        _probe_ok = True
    except Exception as exc:
        last_error = f"probe {type(exc).__name__}: {exc}"
        log.warning("lm_head_stats compile probe failed (%s)", last_error)
        _probe_ok = False
    return _probe_ok


@partial(jax.jit, static_argnames=("vocab_size",))
def _run(x: jax.Array, wte_t: jax.Array, vocab_size: int):
    r, h = x.shape
    vp = wte_t.shape[1]
    n_chunks, v_chunk = _chunking(vp, r, h)
    if v_chunk is None:
        return None
    nw_c = v_chunk // WINDOW
    nw_pad = -(-nw_c // 8) * 8
    kern = partial(_kernel, vocab_size=vocab_size, v_chunk=v_chunk,
                   n_chunks=n_chunks)
    return pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((r, h), lambda iv: (0, 0)),
            pl.BlockSpec((h, v_chunk), lambda iv: (0, iv)),
        ],
        out_specs=[
            pl.BlockSpec((r, v_chunk), lambda iv: (0, iv)),
            pl.BlockSpec((n_chunks * nw_pad, r), lambda iv: (0, 0)),
            pl.BlockSpec((r, 1), lambda iv: (0, 0)),
            pl.BlockSpec((r, 1), lambda iv: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, vp), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * nw_pad, r), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
    )(x, wte_t)


def lm_head_stats(
    x: jax.Array,          # [R, H] hidden states (compute dtype)
    wte_t: jax.Array,      # [H, Vp] transposed LM head, Vp a 128-multiple
    vocab_size: int,
) -> Optional[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]:
    """(logits [R,Vp] f32 row-major, wmax [R,Vp/128], m [R], l [R]) or None.

    Pad columns carry -inf (and never win a window max). ``l`` is the row
    sum of exp(logit - m) — ls = log(l) is the log-softmax shift.
    """
    global last_backend, last_error
    from video_caption_tpu.ops.pallas.platform import on_tpu

    if not on_tpu():
        last_backend = "xla"
        return None
    r, h = x.shape
    vp = wte_t.shape[1]
    if vp % WINDOW or r % 8 or h % 128:
        last_backend = "xla"
        return None
    if not _compile_probe():
        last_backend = "xla"
        return None
    try:
        out = _run(x, wte_t, vocab_size)
        if out is None:
            last_backend = "xla"
            return None
        logits, wmax_t, m, l = out
        # [n_chunks*nw_pad, R] -> drop per-chunk pad rows -> [R, W]
        n_chunks = _chunking(vp, r, h)[0]
        nw_pad = wmax_t.shape[0] // n_chunks
        nw_c = vp // WINDOW // n_chunks
        wmax = wmax_t.reshape(n_chunks, nw_pad, r)[:, :nw_c, :]
        wmax = wmax.reshape(n_chunks * nw_c, r).T
        last_backend = "pallas"
        return logits, wmax, m[:, 0], l[:, 0]
    except Exception as exc:  # lowering/compile failure -> XLA path
        last_backend = "xla"
        last_error = f"{type(exc).__name__}: {exc}"
        log.warning("lm_head_stats kernel unavailable (%s)", last_error)
        return None
