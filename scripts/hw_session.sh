#!/bin/bash
# One-shot hardware measurement session: run everything that needs the real
# TPU chip, each stage bounded and logged, continuing past failures. The
# tunneled link comes and goes — this captures all round-3 evidence in one
# window. Logs land in /tmp/hw_session/.
set -u
OUT=/tmp/hw_session
mkdir -p "$OUT"
cd /root/repo
# keep the device-plugin site (PYTHONPATH as shipped) AND make the repo
# importable for `python scripts/<x>.py` entries (sys.path[0] is scripts/)
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name (timeout ${tmo}s) start $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc at $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
  tail -3 "$OUT/$name.log" | sed 's/^/    /' | tee -a "$OUT/session.log"
}

# 0. sanity: is the chip reachable?
run sanity 300 python -c "import jax; print(jax.devices())" || true
grep -q Tpu "$OUT/sanity.log" || grep -qi axon "$OUT/sanity.log" || {
  echo "NO DEVICE — aborting" | tee -a "$OUT/session.log"; exit 1; }

# 0.5 smoke: small-batch decode with the new kernels ON (first real Mosaic
# compile of beam_attention/lm_head — interpret-mode tests can't catch
# TPU-only lowering failures; the fallback contract only covers trace-time
# errors, so a compile failure here = fix before trusting later stages)
run smoke 1800 python scripts/ab_decode.py 8 2

# 1. kernel A/B at production batch (also proves the new kernels engage)
run ab_decode 2400 python scripts/ab_decode.py 64 5

# 2. full bench (headline JSON + roofline refresh -> reports/roofline.json)
run bench 3000 python bench.py

# 3. hlo_stats profiles: beam, sampled, encode
run profile_beam 1200 python scripts/profile_beam.py 64 /tmp/hlo_stats_beam.csv beam
run profile_sampled 1200 python scripts/profile_beam.py 64 /tmp/hlo_stats_sampled.csv sampled
run profile_encode 1200 python scripts/profile_encode.py 64 /tmp/hlo_stats_encode.csv

# 4. single-request latency breakdown (AOT path) + overlap A/B (r4 p50 lever)
run single_request 1800 python scripts/profile_single_request.py 30
run single_request_no_overlap 1800 env VIDEO_CAPTION_OVERLAP_UPLOAD=0 \
    python scripts/profile_single_request.py 30

# 5. serving sweep to the saturation knee
run serving_sweep 3000 python -m video_caption_tpu.bench.serving_load --sweep \
    --duration 20 --out reports/serving_load_sweep.json

# 6. retrieval leg of the quality loop at full size (96 classes, 192
# paraphrase queries, binomial p-value — VERDICT r3 #5)
run align_retrieval 3000 python scripts/align_retrieval.py

# 6.5 full quality loop at round-4 scale (96 classes, 192 val clips,
# 2-paraphrase language; stage3 -> mapper -> eval_compare/ablate/retrieval —
# VERDICT r3 #7). The longest stage; logs under /tmp/hw_session.
run quality_loop 7200 python -m video_caption_tpu.tools.quality_loop --root /tmp/qloop_r4

# 7. deployment numerics gate on-chip (now includes the decode-kernel leg)
run alignment 1800 bash -c 'python -m video_caption_tpu.bench.accuracy_alignment --image_size 224 --num_frames 4 > reports/accuracy_alignment.json && tail -c 400 reports/accuracy_alignment.json'

echo "SESSION DONE $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
