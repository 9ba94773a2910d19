"""Device-level A/B of the greedy/sampled (K=1) decode cache variants.

Wall-clock A/B (scripts/ab_decode.py) is blind at this granularity on a
congested tunneled link: every sync carries a ~25-30 ms host<->device
round-trip (measured 2026-08-19: hlo_stats self-time 37.7 ms vs 64-75 ms
wall for the SAME sampled program), larger than the effects under test.
This runner subprocess-invokes scripts/profile_beam.py (jax.profiler trace
-> hlo_stats self-time) per variant and reports DEVICE ms/iter:

  split            sample_split_cache=1 deferred=0   (current default)
  split+deferred   sample_split_cache=1 deferred=1   (one cross-layer slab
                                                      write/step vs 12)
  contig           sample_split_cache=0 deferred=0   (round-2/3 layout)
  contig+deferred  sample_split_cache=0 deferred=1

Also runs the beam group default vs deferred (the beam step has the same
12-per-step write structure). Usage:
    python scripts/ab_sample_cache.py [batch]
Prints one JSON line per variant.
"""
import json
import os
import re
import subprocess
import sys

batch = sys.argv[1] if len(sys.argv) > 1 else "64"
here = os.path.dirname(os.path.abspath(__file__))

VARIANTS = [
    ("split", "sampled", {"VIDEO_CAPTION_SAMPLE_SPLIT_CACHE": "1",
                          "VIDEO_CAPTION_DEFERRED_KV_WRITE": "0"}),
    ("split+deferred", "sampled", {"VIDEO_CAPTION_SAMPLE_SPLIT_CACHE": "1",
                                   "VIDEO_CAPTION_DEFERRED_KV_WRITE": "1"}),
    ("contig", "sampled", {"VIDEO_CAPTION_SAMPLE_SPLIT_CACHE": "0",
                           "VIDEO_CAPTION_DEFERRED_KV_WRITE": "0"}),
    ("contig+deferred", "sampled", {"VIDEO_CAPTION_SAMPLE_SPLIT_CACHE": "0",
                                    "VIDEO_CAPTION_DEFERRED_KV_WRITE": "1"}),
    ("beam", "beam", {"VIDEO_CAPTION_DEFERRED_KV_WRITE": "0"}),
    ("beam+deferred", "beam", {"VIDEO_CAPTION_DEFERRED_KV_WRITE": "1"}),
]

PAT = re.compile(r"total self time: [\d.]+ ms over \d+ iters \(([\d.]+) ms/iter\)")
WALL = re.compile(r"^iter ([\d.]+) ms", re.M)

for name, stage, env in VARIANTS:
    e = dict(os.environ)
    e.update(env)
    csv = f"/tmp/hlo_ab_{name.replace('+', '_')}.csv"
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "profile_beam.py"), batch, csv, stage],
        env=e, capture_output=True, text=True, timeout=1500)
    m = PAT.search(proc.stdout)
    walls = [float(x) for x in WALL.findall(proc.stdout)]
    print(json.dumps({
        "variant": name, "stage": stage,
        "device_ms_per_iter": float(m.group(1)) if m else None,
        "wall_ms": walls,
        "rc": proc.returncode,
        "err": None if proc.returncode == 0 else proc.stdout[-300:] + proc.stderr[-300:],
    }), flush=True)
