"""Unified per-row-policy decode: every preset of every video in ONE program.

SURVEY §7 hard part 6. The reference answers "3 presets per request" with
3 sequential full decodes (core/engine.py:75-79); round 2 of this rebuild
merged *identical* policies into batched programs, but different policies
(the beam presets vs the sampled preset) still ran as separate programs —
each re-streaming the full GPT-2 weights every decode step, on a step that
is weight-bandwidth/overhead bound.

This module decodes ALL policy groups in one compiled program. Per step:

- the token-selection logic runs per group (static row slices) using the
  exact helpers the single-policy paths use (``beam_select`` /
  ``sample_select`` from decode/generate.py), so token outputs are
  identical to the grouped path,
- the transformer forward runs ONCE over the full mixed row set
  (``g2.gpt2_mixed_step``): all weight matmuls and the LM head stream the
  GPT-2 weights a single time for every policy; a sampled row rides the
  beam machinery as a K=1 beam with identity ancestry,
- groups with a smaller ``max_new_tokens`` FREEZE once their horizon is
  reached (their carry is held by ``jnp.where``), which preserves exact
  per-group semantics while the scan runs to the longest horizon.

Fixed shapes throughout; one ``lax.scan``; no host round-trips.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from video_caption_tpu.decode.generate import (
    DecodeParams, _prefill, beam_finalize, beam_select, sample_select,
)
from video_caption_tpu.models import gpt2 as g2


@partial(jax.jit, static_argnames=("gpt2_cfg", "dps"))
def generate_unified(
    gpt2_params,
    gpt2_cfg: g2.GPT2Config,
    prefix: jax.Array,              # [V, P, H] visual prefix embeddings
    prompts: Tuple[Tuple[jax.Array, jax.Array], ...],  # per group: (ids [n_g,L_g], mask [n_g,L_g])
    dps: Tuple[DecodeParams, ...],  # static — one policy per group
    rngs: Tuple[jax.Array, ...],    # one key per group (sampled groups consume it)
) -> Tuple[jax.Array, ...]:
    """Decode V videos under every policy group at once.

    Group g contributes I_g = V * n_g prompt instances (video-major row
    order, matching the grouped engine path) and returns ids
    [I_g, dp.max_new_tokens]. Row order inside a group and the returned
    token ids are IDENTICAL to running ``generate_prefixed`` per group
    with the same per-group rng keys.
    """
    v, p, h = prefix.shape
    wte = gpt2_params["wte"]
    l_max = max(int(ids.shape[1]) for ids, _ in prompts)
    n_max = max(dp.max_new_tokens for dp in dps)
    s0 = p + l_max

    # ---- prefill rows: group-major, video-major within a group ------------
    emb_rows, mask_rows, n_inst = [], [], []
    for ids_g, mask_g in prompts:
        n_g, l_g = ids_g.shape
        tok = wte[ids_g]                                    # [n_g, L_g, H]
        mask_g = mask_g.astype(jnp.int32)
        if l_g < l_max:
            # extra pad sits BETWEEN prefix and prompt with mask 0 — position-
            # and attention-equivalent to the group's own shorter padding
            tok = jnp.pad(tok, ((0, 0), (l_max - l_g, 0), (0, 0)))
            mask_g = jnp.pad(mask_g, ((0, 0), (l_max - l_g, 0)))
        tok_v = jnp.tile(tok, (v, 1, 1))                    # [(V*n_g), L_max, H]
        mask_v = jnp.tile(mask_g, (v, 1))
        pre = jnp.repeat(prefix, n_g, axis=0)               # [(V*n_g), P, H]
        emb_rows.append(jnp.concatenate([pre.astype(tok_v.dtype), tok_v], axis=1))
        mask_rows.append(jnp.concatenate(
            [jnp.ones((v * n_g, p), jnp.int32), mask_v], axis=1))
        n_inst.append(v * n_g)
    embeds = jnp.concatenate(emb_rows, axis=0)              # [I_tot, S0, H]
    pmask = jnp.concatenate(mask_rows, axis=0)

    # ONE prefill for every instance of every group (weights stream once)
    last_inst, prefill_cache, prefill_valid, row_len = _prefill(
        gpt2_params, gpt2_cfg, embeds, s0, pmask, cache_layout="stacked"
    )

    # ---- per-group decode state ------------------------------------------
    group_shapes = tuple((n_inst[g], dp.num_beams) for g, dp in enumerate(dps))
    neg_inf = jnp.float32(-1e9)
    states, ll_rows, anc_rows, rl_rows = [], [], [], []
    i_off = r_base = 0
    for g, dp in enumerate(dps):
        i, k, n = n_inst[g], dp.num_beams, dp.max_new_tokens
        rg = i * k
        ll = last_inst[i_off:i_off + i]
        rl = row_len[i_off:i_off + i]
        if k > 1:
            ll_rows.append(jnp.repeat(ll, k, axis=0))
            rl_rows.append(jnp.repeat(rl, k, axis=0))
            anc_rows.append(jnp.zeros((rg, n_max), jnp.int32))
            beam_scores = jnp.tile(jnp.concatenate(
                [jnp.zeros((1,)), jnp.full((k - 1,), neg_inf)]), (i, 1))
            states.append((
                beam_scores,
                jnp.full((i, k, n), dp.eos_id, jnp.int32),
                jnp.full((i, k), -jnp.inf, jnp.float32),
                jnp.full((i, k, n), dp.eos_id, jnp.int32),
            ))
        else:
            ll_rows.append(ll)
            rl_rows.append(rl)
            # identity ancestry: a sampled/greedy row is its own ancestor at
            # every column, so the dense attention degenerates to causal
            # self-attention over the row's own cache
            anc_rows.append(jnp.broadcast_to(
                jnp.arange(rg, dtype=jnp.int32)[:, None], (rg, n_max)))
            states.append((
                jnp.full((i, n), dp.eos_id, jnp.int32),
                jnp.zeros((i,), bool),
                rngs[g],
            ))
        i_off += i
        r_base += rg
    r_tot = r_base
    last_logits = jnp.concatenate(ll_rows, axis=0)          # [R_tot, V]
    anc0 = jnp.concatenate(anc_rows, axis=0)                # [R_tot, N_max]
    row_len_rows = jnp.concatenate(rl_rows, axis=0)         # [R_tot]
    gen_cache = g2.init_cache(gpt2_cfg, r_tot, n_max, layout="stacked")

    def step(carry, t):
        last_logits, gen_kv, anc, states = carry
        tokens, anc_parts, new_states = [], [], []
        r_off = 0
        for g, dp in enumerate(dps):
            i, k, n = n_inst[g], dp.num_beams, dp.max_new_tokens
            rg = i * k
            ll = last_logits[r_off:r_off + rg]
            anc_g = anc[r_off:r_off + rg]
            live = t < n            # False once this group's horizon passed
            if k > 1:
                bs, gen, fs, fseq = states[g]
                tok2d, flat_parent, nbs, ngen, nfs, nfseq = beam_select(
                    ll, bs, gen, fs, fseq, t, dp, k)
                anc_new = anc_g[flat_parent].at[:, t].set(
                    jnp.arange(rg, dtype=jnp.int32))
                tok = tok2d.reshape(-1)
                if n < n_max:       # freeze past the group's horizon
                    nbs = jnp.where(live, nbs, bs)
                    ngen = jnp.where(live, ngen, gen)
                    nfs = jnp.where(live, nfs, fs)
                    nfseq = jnp.where(live, nfseq, fseq)
                    anc_new = jnp.where(live, anc_new, anc_g)
                    tok = jnp.where(live, tok, dp.eos_id)
                new_states.append((nbs, ngen, nfs, nfseq))
            else:
                gen, fin, rng_g = states[g]
                tok, ngen, nfin, nrng = sample_select(ll, gen, fin, t, dp, rng_g)
                anc_new = anc_g     # identity ancestry never changes
                if n < n_max:
                    ngen = jnp.where(live, ngen, gen)
                    nfin = jnp.where(live, nfin, fin)
                    tok = jnp.where(live, tok, dp.eos_id)
                new_states.append((ngen, nfin, nrng))
            tokens.append(tok)
            anc_parts.append(anc_new)
            r_off += rg
        token_vec = jnp.concatenate(tokens)
        anc = jnp.concatenate(anc_parts, axis=0)
        embeds = wte[token_vec]
        positions = row_len_rows + t
        logits, new_cache = g2.gpt2_mixed_step(
            gpt2_params, embeds, positions, prefill_cache, prefill_valid,
            {"kv": gen_kv}, anc, t, group_shapes, gpt2_cfg,
        )
        return (logits, new_cache["kv"], anc, tuple(new_states)), None

    carry = (last_logits, gen_cache["kv"], anc0, tuple(states))
    carry, _ = jax.lax.scan(step, carry, jnp.arange(n_max, dtype=jnp.int32))
    _, _, _, states = carry

    outs = []
    for g, dp in enumerate(dps):
        if dp.num_beams > 1:
            bs, gen, fs, fseq = states[g]
            outs.append(beam_finalize(bs, gen, fs, fseq, dp.max_new_tokens))
        else:
            outs.append(states[g][0])
    return tuple(outs)
