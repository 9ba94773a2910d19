#!/bin/bash
# Round-5 follow-up (after r5_measure.sh): rerun the decode-kernel
# alignment leg alone with a compile-sized timeout. The full-geometry leg
# needs ~6 heavy remote compiles (beam decode kernels on/off, widen's
# value_and_grad program, greedy decode, 2x gpt2_beam_step) at ~5-7 min
# each on the tunneled compile server — the 2400s wave slot timed out
# after the three encoder legs passed. Merge keeps those green legs.
# Writes via temp + atomic move so a timeout can't blank the artifact.
set -u
OUT=${OUT:-/tmp/r5}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"

echo "=== train_perf2 start $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
timeout 3600 python scripts/r5_train_perf.py > "$OUT/train_perf2.log" 2>&1
echo "=== train_perf2 exit $? at $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
tail -2 "$OUT/train_perf2.log" | sed 's/^/    /'

echo "=== int8_pipelined start $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
timeout 2400 python scripts/r5_int8_pipelined.py 64 5 \
    > "$OUT/int8_pipelined.log" 2>&1
echo "=== int8_pipelined exit $? at $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
tail -3 "$OUT/int8_pipelined.log" | sed 's/^/    /'

echo "=== align_decode start $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
timeout 7200 python -m video_caption_tpu.bench.accuracy_alignment \
    --image_size 224 --num_frames 4 --only decode \
    --merge_into reports/accuracy_alignment.json \
    > "$OUT/accuracy_alignment.tmp" 2> "$OUT/align_decode.log"
rc=$?
echo "=== align_decode exit $rc at $(date +%H:%M:%S)" | tee -a "$OUT/session.log"
if [ -s "$OUT/accuracy_alignment.tmp" ]; then
  mv "$OUT/accuracy_alignment.tmp" reports/accuracy_alignment.json
  tail -c 600 reports/accuracy_alignment.json
else
  echo "EMPTY OUTPUT — artifact left untouched" | tee -a "$OUT/session.log"
  tail -5 "$OUT/align_decode.log"
fi
