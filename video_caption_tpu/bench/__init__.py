"""Benchmark & profiling harness (reference: core/scripts/benchmark_baseline.py,
profile_nsight.py): 4-stage taxonomy (Preprocessing / ViT_Encoder /
Cross_Modal_Alignment / GPT2_Decoder_Step), per-token decode timing,
batch-size sweep with OOM handling, and report files with the reference's
exact names/columns (reports/baseline_*.csv|json, benchmark_bs_*)."""
