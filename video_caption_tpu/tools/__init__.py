"""Batch tooling (reference: tools/): in-process batch inference, best-of
content filtering, hybrid quality-gated fallback inference."""
