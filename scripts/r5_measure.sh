#!/bin/bash
# Round-5 measurement wave — STRICTLY SERIAL (one chip job at a time).
# Legs: clean beam v1/v2 self-time A/B, fresh decode A/B ledger (incl.
# int8), warm-path host attribution, 600-step retrieval, training sweep.
set -u
OUT=${OUT:-/tmp/r5}
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

run alignment 2400 bash -c 'python -m video_caption_tpu.bench.accuracy_alignment --image_size 224 --num_frames 4 > reports/accuracy_alignment.json && tail -c 500 reports/accuracy_alignment.json'
run beam_v1 1800 python scripts/profile_beam.py 64 "$OUT/hlo_beam_v1.csv" beam
run beam_v2 1800 env VIDEO_CAPTION_BEAM_ATTN_V2=1 \
    python scripts/profile_beam.py 64 "$OUT/hlo_beam_v2.csv" beam
run ab_decode 3600 python scripts/ab_decode.py 64 5
run warm 1800 python scripts/profile_warm.py 64 8
run train_perf 3600 python scripts/r5_train_perf.py
run retrieval_600 5400 python scripts/align_retrieval.py --steps 600

echo "R5 MEASURE DONE $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
