"""Data preparation & maintenance scripts (reference: scripts/): MSVD
preparation, multiprocess frame extraction, annotation repair, coverage
checks, loss plotting."""
