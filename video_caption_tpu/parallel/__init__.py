"""Multi-chip scaling seam: device mesh, sharding rules, and pjit'd steps.

The reference has NO distributed layer (SURVEY §2.9) — its concurrency model
is a Semaphore(1) serializing one GPU. Here the equivalent seam is a
``jax.sharding.Mesh`` with data/model axes: 1x1 on a single chip, and batch
DP + megatron-style TP over ICI as a pure config change (SURVEY §5.8)."""

from video_caption_tpu.parallel.mesh import make_mesh, shard_batch, shard_params  # noqa: F401
