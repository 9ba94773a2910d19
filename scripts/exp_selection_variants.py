"""A/B the beam-step SELECTION path (lm_stats -> topk_processed ->
beam ranking) at production shapes, isolated from the model forward.

hlo_stats (v5e, bs=64 beam group, 2026-08-18): the selection machinery costs
~0.9 ms/step — full-logits relayout copies (copy.506 104us + copy.507 120us),
window-content gathers (fusion.1362 82us), and _topk_flat's elementwise
gathers (fusion.1365-67, ~260us). Hypothesis: TPU gathers (and the layouts
XLA picks to serve them) are the cost; one-hot matmul gathers keep
everything row-major and ride the MXU.

Usage: python scripts/exp_selection_variants.py [rows] [trials]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = int(sys.argv[1]) if len(sys.argv) > 1 else 384
trials = int(sys.argv[2]) if len(sys.argv) > 2 else 30

VP = 50688
V = 50257
N = 24
K = 3
C = 2 * K + N + 1   # candidate count of the beam path

rng = np.random.RandomState(0)
logits_np = rng.randn(R, VP).astype(np.float32) * 4
logits_np[:, V:] = -np.inf
logits = jnp.asarray(logits_np)
wmax = jnp.max(logits.reshape(R, VP // 128, 128), axis=-1)
generated = jnp.asarray(rng.randint(0, V, (R, N), np.int32))
t = jnp.int32(12)
jax.block_until_ready((logits, wmax, generated))

from video_caption_tpu.decode import logits_process as lp


def time_fn(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:22s} {statistics.median(ts):7.3f} ms  (min {min(ts):.3f})")
    return out


# ---- variant A: current candidate path --------------------------------------
@jax.jit
def variant_a(logits, wmax, generated, t):
    return lp.topk_processed(logits, generated, t, 2 * K, 1.1, 3, 8, 50256,
                             wmax=wmax)


# ---- variant B: one-hot window gather + one-hot flat stages ------------------
def onehot_gather_axis1(x, idx, n):
    """x [B, n, w], idx [B, kc] -> [B, kc, w] via an exact one-hot dot
    (3-pass f32: the one-hot operand's lo-part is 0, so hi*1+lo*1
    reconstructs the value bit-exactly)."""
    onehot = (idx[:, :, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)).astype(jnp.float32)
    return jax.lax.dot_general(
        onehot, x, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32)


def exact_topk_onehot(scores, k, wmax):
    b, v = scores.shape
    nwin = wmax.shape[1]
    window = v // nwin
    sw = scores.reshape(b, nwin, window)
    kw = min(k, nwin)
    _, widx = jax.lax.top_k(wmax, kw)
    cand = onehot_gather_axis1(sw, widx, nwin)            # [B, kw, window]
    flat = cand.reshape(b, kw * window)
    # second stage: 8-wide sub-windows, one-hot gathered the same way
    sub = 8
    m = kw * window
    fw = flat.reshape(b, m // sub, sub)
    smax = jnp.max(fw, axis=-1)
    _, sidx = jax.lax.top_k(smax, k)
    cand2 = onehot_gather_axis1(fw, sidx, m // sub)       # [B, k, sub]
    vals, ci = jax.lax.top_k(cand2.reshape(b, k * sub), k)
    fi = jnp.take_along_axis(sidx, ci // sub, axis=1) * sub + ci % sub
    idxs = jnp.take_along_axis(widx, fi // window, axis=1) * window + fi % window
    return vals, idxs


def topk_processed_onehot(scores, wmax, generated, t, k):
    b, v = scores.shape
    n_buf = generated.shape[1]
    c = min(k + n_buf + 1, v)
    vals, idxs = exact_topk_onehot(scores, c, wmax)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, n_buf), 1)
    gen_seen = pos < t
    hits = (idxs[:, :, None] == generated[:, None, :]) & gen_seen[:, None, :]
    seen = jnp.any(hits, axis=-1)
    pen = jnp.where(vals > 0, vals / 1.1, vals * 1.1)
    vals = jnp.where(seen, pen, vals)
    banned_tok, match = lp._ngram_banned(generated, t, 3)
    banned = jnp.any(
        (idxs[:, :, None] == banned_tok[:, None, :]) & match[:, None, :], axis=-1)
    vals = jnp.where(banned, jnp.float32(-jnp.inf), vals)
    ban_eos = (idxs == 50256) & (t < 8)
    vals = jnp.where(ban_eos, jnp.float32(-jnp.inf), vals)
    top_vals, pick = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(idxs, pick, axis=-1)


@jax.jit
def variant_b(logits, wmax, generated, t):
    return topk_processed_onehot(logits, wmax, generated, t, 2 * K)


# ---- variant C: one-hot first stage only, lax.top_k on flat 3968 -------------
@jax.jit
def variant_c(logits, wmax, generated, t):
    b, v = logits.shape
    nwin = wmax.shape[1]
    window = v // nwin
    k = 2 * K
    c = k + N + 1
    sw = logits.reshape(b, nwin, window)
    _, widx = jax.lax.top_k(wmax, c)
    cand = onehot_gather_axis1(sw, widx, nwin).reshape(b, c * window)
    vals, ci = jax.lax.top_k(cand, c)
    idxs = jnp.take_along_axis(widx, ci // window, axis=1) * window + ci % window
    return vals, idxs


print(f"rows={R} VP={VP} C={C}")
va = time_fn("A current", variant_a, logits, wmax, generated, t)
vb = time_fn("B onehot(2stage)", variant_b, logits, wmax, generated, t)
vc = time_fn("C onehot+flat topk", variant_c, logits, wmax, generated, t)

# exactness: A vs B
av, ai = [np.asarray(x) for x in va]
bv, bi = [np.asarray(x) for x in vb]
print("A vs B vals equal:", np.array_equal(av, bv), " idx equal:", np.array_equal(ai, bi))
