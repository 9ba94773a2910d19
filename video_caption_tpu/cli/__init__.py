"""Command-line entry points mirroring the reference CLIs:
infer_once (experiments/inference.py), train (src/cli/train.py),
train_full (stage 1/2), train_caption_mapper (the product trainer),
train_decoder_only (stage-3 LM), serve (uvicorn launcher)."""
