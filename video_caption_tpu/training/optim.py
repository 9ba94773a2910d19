"""Optimizer assembly with per-parameter-group learning rates.

Mirrors the reference's param groups (src/cli/train_caption_mapper.py:217-252):
proj/mapper/adapter at ``lr``, optionally the last N GPT-2 blocks at
``lr_gpt2``, everything else frozen. With stacked [depth, ...] block
parameters, per-layer freezing is a per-depth LR mask applied to the *adam
update* (not the gradient — Adam is scale-invariant, so gradient masking
would not implement a layer-wise LR).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


def mapper_lr_tree(
    params: Any,
    lr: float = 3e-4,
    lr_gpt2: float = 1e-5,
    unfreeze_last: int = 0,
    n_layer: int = 12,
) -> Any:
    """Pytree of LR multipliers matching ``params``: scalar 0 freezes a leaf,
    a [depth,1,..,1] array gives per-layer rates for stacked block params."""

    def depth_mask(shape) -> jnp.ndarray:
        mask = np.zeros((n_layer,), np.float32)
        if unfreeze_last > 0:
            mask[n_layer - unfreeze_last:] = lr_gpt2
        return jnp.asarray(mask.reshape((n_layer,) + (1,) * (len(shape) - 1)))

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        if path.startswith("/mapper") or path.startswith("/proj"):
            return jnp.float32(lr)
        if path.startswith("/decoder/blocks"):
            return depth_mask(np.shape(tree))
        # decoder embeddings / final LN and the whole encoder stay frozen
        return jnp.float32(0.0)

    return walk(params)


def build_optimizer(lr_tree: Any, weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW whose final update is scaled leaf-wise by ``lr_tree``."""

    def scale_by_tree() -> optax.GradientTransformation:
        def init(params):
            del params
            return optax.EmptyState()

        def update(updates, state, params=None):
            del params
            return jax.tree.map(lambda u, s: u * s, updates, lr_tree), state

        return optax.GradientTransformation(init, update)

    wd_mask = jax.tree.map(lambda s: bool(np.any(np.asarray(s) > 0)), lr_tree)
    return optax.chain(
        optax.clip_by_global_norm(1.0),   # reference grad-clip (train_decoder_only.py:101-118)
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay, mask=wd_mask),
        scale_by_tree(),
        optax.scale(-1.0),
    )


def full_finetune_lr_tree(params: Any, lr: float) -> Any:
    """Uniform LR over every leaf (stage-1/2 style joint training)."""
    return jax.tree.map(lambda _: jnp.float32(lr), params)
