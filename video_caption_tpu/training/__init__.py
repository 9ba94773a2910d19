"""Training stack: reconstructed dataloader, mapper fine-tune (the product
trainer), alignment trainers, stage-3 LM tune, and Orbax checkpointing —
the capability surface of src/cli/train*.py, built on optax + pjit."""
