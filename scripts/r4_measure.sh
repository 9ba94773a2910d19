#!/bin/bash
# Round-4 post-change measurement wave (run when the chip is free).
# Order: cheapest/highest-information first; each stage bounded + logged.
set -u
OUT=/tmp/r4_measure
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name (timeout ${tmo}s) start $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc at $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
  tail -3 "$OUT/$name.log" | sed 's/^/    /' | tee -a "$OUT/session.log"
}

# 1. device-level cache-variant A/B (deferred write x split/contig + beam)
run ab_sample_cache 4800 python scripts/ab_sample_cache.py 64

# 2. fresh decode profiles with the ngram/static-slice + row-gather fixes
run profile_beam 1200 python scripts/profile_beam.py 64 /tmp/hlo_beam_r4b.csv beam
run profile_sampled 1200 python scripts/profile_beam.py 64 /tmp/hlo_sampled_r4b.csv sampled

# 3. single-request latency with unified_fused_request (p50 lever)
run single_request 1800 python scripts/profile_single_request.py 30
run single_request_grouped 1800 env VIDEO_CAPTION_UNIFIED_FUSED=0 \
    python scripts/profile_single_request.py 30

# 4. full bench: amortized roofline + headline (writes reports/)
run bench 3000 python bench.py

# 5. retrieval leg at full size (the 413 fix)
run align_retrieval 3600 python scripts/align_retrieval.py

# 6. serving sweep with the backlog fix + send-window gate
run serving_sweep 3600 python -m video_caption_tpu.bench.serving_load --sweep \
    --duration 20 --out reports/serving_load_sweep.json

# 7. deployment numerics gate (redesigned decode leg: value tol + agreement
# floor) — default kernels, then the time-blocked v2 beam kernel
run alignment 1800 bash -c 'python -m video_caption_tpu.bench.accuracy_alignment --image_size 224 --num_frames 4 > reports/accuracy_alignment.json; tail -c 600 reports/accuracy_alignment.json'
run alignment_v2 1800 env VIDEO_CAPTION_BEAM_ATTN_V2=1 \
    python -m video_caption_tpu.bench.accuracy_alignment --image_size 224 --num_frames 4

echo "R4 MEASURE DONE $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
