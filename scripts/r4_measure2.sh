#!/bin/bash
# Round-4 follow-up wave: v2 beam-attention kernel A/B after the
# Mosaic-illegal anc BlockSpec fix, plus a token-parity gate with v2 on.
set -u
OUT=/tmp/r4_measure2
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

# 1. beam group device self-time: default (v1) vs v2 time-blocked
run beam_v1 1200 python scripts/profile_beam.py 64 /tmp/hlo_beam_v1.csv beam
run beam_v2 1200 env VIDEO_CAPTION_BEAM_ATTN_V2=1 \
    python scripts/profile_beam.py 64 /tmp/hlo_beam_v2.csv beam

# 2. numerics gate (value tol + recalibrated agreement floor): default
# kernels (writes reports/), then the v2 beam kernel
run alignment 1800 bash -c 'python -m video_caption_tpu.bench.accuracy_alignment --image_size 224 --num_frames 4 > reports/accuracy_alignment.json; tail -c 700 reports/accuracy_alignment.json'
run alignment_v2 1800 env VIDEO_CAPTION_BEAM_ATTN_V2=1 \
    python -m video_caption_tpu.bench.accuracy_alignment --image_size 224 --num_frames 4

# 3. retrieval leg, longer train (loss was still falling at step 300: 3.46
# from ln(96)=4.56; R@1 p was 0.052, just over the bar)
run align_retrieval_600 3600 python scripts/align_retrieval.py --steps 600

echo "R4 MEASURE2 DONE $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
