"""Pipelined int8 decode A/B (VERDICT r4 #2 closure): the sync per-program
ab_decode ledger overcharges the grouped path for host dispatch gaps, so the
int8 default decision must come from the engine's real dispatch shape — the
async back-to-back grouped decode measured by measure_roofline's
decode[grouped,pipelined] stage. Builds one engine per variant and reports
that stage plus device_total/device_caps.

Usage: python scripts/r5_int8_pipelined.py [batch] [trials]
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5

from video_caption_tpu.bench.roofline import measure_roofline
from video_caption_tpu.config import default_inference_config
from video_caption_tpu.engine import InferenceEngine

out = {}
for name, overrides in (("default", {}), ("int8_decoder",
                                          {"quantize_decoder_int8": True})):
    cfg = default_inference_config(ckpt="none.pt", num_frames=16)
    cfg = dataclasses.replace(
        cfg, compile=dataclasses.replace(cfg.compile, **overrides))
    eng = InferenceEngine(cfg)
    r = measure_roofline(eng, batch=batch, trials=trials, report_path=None)
    keep = {s["stage"]: s["device_ms"] for s in r["stages"]}
    out[name] = {"stages_ms": keep,
                 "device_total_ms": r["device_total_ms"],
                 "device_caps_per_sec": r["device_caps_per_sec"]}
    print(json.dumps({name: out[name]}), flush=True)
    del eng

with open("reports/ab_int8_pipelined.json", "w") as f:
    json.dump({"date": "2026-08-20", "batch": batch, "trials": trials,
               "note": "pipelined grouped decode A/B for the int8 default "
                       "decision (ab_decode.json rows are sync-timed)",
               "variants": out}, f, indent=1)
    f.write("\n")
print("wrote reports/ab_int8_pipelined.json")
