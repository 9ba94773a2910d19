"""Accuracy alignment between execution paths — the check the reference
reserved but never implemented (core/scripts/accuracy_alignment.py:5,
model_loader.py:46-48 "torch vs optimized backend comparison").

Here the compared backends are real: for each pipeline stage, the
**interpreter path** (eager JAX, fp32, Pallas off) is the golden reference
and the **compiled paths** (jit bf16 policy, Pallas kernels on) must agree
within stage-appropriate tolerances. Run on any platform; on TPU this is
the deployment-accuracy gate.

Usage: python -m video_caption_tpu.bench.accuracy_alignment [--image_size 224]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def check_alignment(image_size: int = 224, num_frames: int = 4, seed: int = 0) -> Dict:
    from video_caption_tpu.models import caption_model as cm
    from video_caption_tpu.models import gpt2 as g2
    from video_caption_tpu.models import vit as vt

    results: Dict[str, Dict] = {}
    rng = jax.random.PRNGKey(seed)

    base_vit = vt.ViTConfig(image_size=image_size, dtype=jnp.float32, use_pallas_pool=False)
    base_gpt = g2.GPT2Config(dtype=jnp.float32)
    golden_cfg = cm.CaptionModelConfig(vit=base_vit, gpt2=base_gpt, use_pallas_projector=False)
    params = cm.init_caption_model(rng, golden_cfg)
    video = jax.random.normal(jax.random.PRNGKey(1), (1, num_frames, 3, image_size, image_size))

    # fp32 comparisons must pin true-fp32 matmuls: both TPU and XLA:CPU run
    # "fp32" matmuls in reduced precision by default, which swamps the gates
    with jax.default_matmul_precision("highest"):
        with jax.disable_jit():
            golden_emb = cm.encode_video(params, video, golden_cfg)
            golden_prefix = cm.video_to_prefix(params, video, golden_cfg)

    def record(name: str, got, ref, tol: float):
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref)) + 1e-9)
        rel = err / scale
        results[name] = {"max_abs_err": err, "rel_err": rel, "tol": tol, "ok": rel <= tol}
        log.info("%-28s rel_err=%.2e (tol %.0e) %s", name, rel, tol,
                 "OK" if rel <= tol else "FAIL")

    # 1. jit fp32 vs eager fp32 — must be tight
    with jax.default_matmul_precision("highest"):
        emb_jit = jax.jit(lambda p, v: cm.encode_video(p, v, golden_cfg))(params, video)
    record("encoder jit-fp32 vs eager", emb_jit, golden_emb, 1e-3)

    # 2. bf16 compiled policy vs fp32 golden — deployment numerics
    bf16_cfg = dataclasses.replace(
        golden_cfg, vit=dataclasses.replace(base_vit, dtype=jnp.bfloat16),
        gpt2=dataclasses.replace(base_gpt, dtype=jnp.bfloat16),
    )
    emb_bf16 = jax.jit(lambda p, v: cm.encode_video(p, v, bf16_cfg))(params, video)
    record("encoder bf16 vs fp32", emb_bf16, golden_emb, 5e-2)

    # 3. pallas kernels vs XLA path
    pallas_cfg = dataclasses.replace(
        golden_cfg,
        vit=dataclasses.replace(base_vit, use_pallas_pool=True, use_pallas_attention=True),
        use_pallas_projector=True,
    )
    from jax.experimental.pallas import tpu as pltpu

    try:
        with jax.default_matmul_precision("highest"):
            if jax.default_backend() in ("tpu", "axon"):
                prefix_pallas = jax.jit(
                    lambda p, v: cm.video_to_prefix(p, v, pallas_cfg)
                )(params, video)
            else:
                with pltpu.force_tpu_interpret_mode():
                    prefix_pallas = cm.video_to_prefix(params, video, pallas_cfg)
        record("pallas ops vs XLA", prefix_pallas, golden_prefix, 1e-3)
    except Exception as exc:  # pragma: no cover
        results["pallas ops vs XLA"] = {"ok": False, "error": str(exc)}

    # 4. decode kernels (lm_head stats + beam attention) vs XLA, two checks:
    #
    # (a) VALUE check on one full beam-step's logits (12 layers + LM head,
    #     kernels on vs off): rel tolerance 3e-2. The failure class this
    #     leg exists for — mask/ancestry corruption like the >256-row
    #     one-hot rounding bug of 2026-08-18 — produces rel errors ~0.3+
    #     (max_abs 1.1 on O(3) logits); reduction-order noise between the
    #     Mosaic and XLA schedules compounds to ~1.4e-2 rel through 12
    #     bf16 layers (measured v5e 2026-08-19). Wide separation.
    # (b) TOKEN agreement rate >= 0.6 of videos over a short beam decode.
    #     EXACT equality was the round-3 spec and is unachievable between
    #     two reduction orders at bf16 on random ~0.02-scale embeddings:
    #     logits are flat, per-step argmax agreement measured 97.2%, and
    #     beam search amplifies one near-tie into a fully different row.
    #     The agreement rate itself is NOISY ACROSS CODE VERSIONS — any
    #     change to the shared selection code re-fuses both programs and
    #     re-resolves near-ties differently (measured 66/72 = 0.92 on
    #     2026-08-19, 57/72 = 0.79 after the bit-identical flat-row gather
    #     landed) — so the floor is a failure-class separator, not a
    #     noise bound: mask/ancestry corruption flips essentially every
    #     video (agreement ~0, and the VALUE check above fails at ~10x
    #     tolerance simultaneously); association noise has stayed >= 0.79.
    #
    # On TPU this runs the real kernels at production GPT-2 geometry;
    # off-TPU it runs Pallas interpret mode at a TINY geometry (full-vocab
    # interpret decode takes tens of minutes on CPU) where both paths are
    # f32 and tokens match exactly in practice. Row count stays a multiple
    # of 8 so the lm_head kernel engages.
    try:
        from video_caption_tpu.decode.generate import DecodeParams, generate

        on_tpu = jax.default_backend() in ("tpu", "axon")
        if on_tpu:
            gpt_off = dataclasses.replace(
                base_gpt, dtype=jnp.bfloat16,
                use_pallas_lm_head=False, use_pallas_beam_attention=False)
            dec_params = params["decoder"]
        else:
            gpt_off = g2.GPT2Config(
                vocab_size=256, n_embd=128, n_layer=2, n_head=2,
                dtype=jnp.float32,
                use_pallas_lm_head=False, use_pallas_beam_attention=False)
            dec_params = g2.init_gpt2_params(jax.random.PRNGKey(9), gpt_off)
        from video_caption_tpu.config import _env_bool

        gpt_on = dataclasses.replace(
            gpt_off, use_pallas_lm_head=True, use_pallas_beam_attention=True,
            # honor the v2 opt-in so `VIDEO_CAPTION_BEAM_ATTN_V2=1 python -m
            # ...accuracy_alignment` actually gates the time-blocked kernel
            # (this leg builds GPT2Config directly, bypassing CompileConfig)
            beam_attn_time_blocked=_env_bool("VIDEO_CAPTION_BEAM_ATTN_V2", False))
        dp = DecodeParams(max_new_tokens=6, num_beams=4, min_new_tokens=2,
                          eos_id=gpt_off.vocab_size - 1)
        # On TPU the batch MUST put the beam row count past 256: integer
        # one-hot dots inside Mosaic kernels are only exact for values
        # <= 256 (bf16-mantissa passes), and the ancestry-expansion bug
        # that corrupted rows > 256 at the production bs=64 (R=384) was
        # invisible to this gate at its original 2x4=8 rows (caught
        # 2026-08-18 by a standalone kernel-vs-XLA sweep instead).
        emb_batch = 72 if on_tpu else 2          # 72 x 4 beams = 288 rows
        b_gate, k_gate = emb_batch, dp.num_beams
        emb = jax.random.normal(jax.random.PRNGKey(5),
                                (emb_batch, 5, gpt_off.n_embd)) * 0.02

        # (a) one-step logits value check (beam step with a half-filled cache)
        def _ctx(mode):
            r_g = b_gate * k_gate
            h_g = gpt_off.n_embd
            cast = (lambda x: x.astype(gpt_off.dtype))
            pkv = {
                "k": cast(jax.random.normal(jax.random.PRNGKey(11),
                                            (gpt_off.n_layer, b_gate, 9, h_g)) * 0.1),
                "v": cast(jax.random.normal(jax.random.PRNGKey(12),
                                            (gpt_off.n_layer, b_gate, 9, h_g)) * 0.1),
            }
            gen = cast(jax.random.normal(jax.random.PRNGKey(13),
                                         (gpt_off.n_layer, 6, 2, r_g, h_g)) * 0.1)
            anc_np = np.random.RandomState(0).randint(0, k_gate, (r_g, 6))
            anc = jnp.asarray((np.arange(r_g)[:, None] // k_gate * k_gate
                               + anc_np).astype(np.int32))
            step_emb = cast(jax.random.normal(jax.random.PRNGKey(14), (r_g, h_g)) * 0.02)
            out, _ = g2.gpt2_beam_step(
                dec_params, step_emb, jnp.full((r_g,), 9, jnp.int32), pkv,
                jnp.ones((b_gate, 9), jnp.int32), {"kv": gen}, anc,
                jnp.int32(3), k_gate, mode)
            return np.asarray(out, np.float32)

        if on_tpu:
            lo_off, lo_on = _ctx(gpt_off), _ctx(gpt_on)
        else:
            lo_off = _ctx(gpt_off)
            with pltpu.force_tpu_interpret_mode():
                lo_on = _ctx(gpt_on)
        step_rel = float(np.abs(lo_on - lo_off).max() /
                         (np.abs(lo_off).max() + 1e-9))

        # (b) token agreement over the short beam decode
        ids_off = np.asarray(generate(dec_params, gpt_off, emb, dp))
        if on_tpu:
            ids_on = np.asarray(generate(dec_params, gpt_on, emb, dp))
        else:
            with pltpu.force_tpu_interpret_mode():
                ids_on = np.asarray(generate(dec_params, gpt_on, emb, dp))
        from video_caption_tpu.ops.pallas import beam_attention, lm_head

        agree = float((ids_on == ids_off).all(axis=1).mean())
        ok = step_rel <= 3e-2 and agree >= 0.6
        results["decode kernels vs XLA"] = {
            "ok": ok,
            "step_logits_rel_err": step_rel, "step_rel_tol": 3e-2,
            "token_agreement_rate": agree, "agreement_floor": 0.6,
            "tokens_equal": bool((ids_on == ids_off).all()),
            "beam_attention_backend": beam_attention.last_backend,
            "lm_head_backend": lm_head.last_backend,
        }
        log.info("%-28s step_rel=%.2e agree=%.3f (beam_attn=%s lm_head=%s)",
                 "decode kernels vs XLA", step_rel, agree,
                 beam_attention.last_backend, lm_head.last_backend)
    except Exception as exc:  # pragma: no cover
        results["decode kernels vs XLA"] = {"ok": False, "error": str(exc)}

    results["all_ok"] = all(v.get("ok") for v in results.values() if isinstance(v, dict))
    return results


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--num_frames", type=int, default=2)
    args = p.parse_args(argv)
    results = check_alignment(args.image_size, args.num_frames)
    print(json.dumps(results, indent=1))
    return 0 if results["all_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
