"""Orbax checkpointing with reference-compatible metadata.

Save payload mirrors the reference's torch.save dict
(src/cli/train_caption_mapper.py:301-305): parameters plus
``{"step", "epoch", "best_val", "args"}``. Torch-format checkpoints are
importable through models/convert.py (the "resume = load best ckpt"
semantics of the reference, SURVEY §5.4 — no mid-epoch resume to match).
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def save_checkpoint(
    path: str,
    params: Any,
    step: int = 0,
    epoch: int = 0,
    best_val: float = float("inf"),
    args: Optional[Dict] = None,
    opt_state: Any = None,
) -> None:
    """Write params (+ metadata, + optional optimizer state) to ``path``."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta = {"step": step, "epoch": epoch, "best_val": best_val, "args": args or {}}
    (path / "train_meta.json").write_text(json.dumps(meta))
    log.info("saved checkpoint to %s (step=%d best_val=%.4f)", path, step, best_val)


def restore_params(path: str, like: Any) -> Optional[Any]:
    """Restore a parameter pytree shaped like ``like``; None if absent.

    The saved payload may be ``{"params"}`` (mapper trainer) or
    ``{"params", "opt_state"}`` (training/loop.py CLIs) — the abstract
    restore tree is built from the checkpoint's own metadata so both
    shapes restore cleanly instead of tripping a tree-structure mismatch.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if not path.exists():
        return None
    ckptr = ocp.StandardCheckpointer()
    try:
        meta = ckptr.metadata(path).item_metadata.tree
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype), meta
        )
        restored = ckptr.restore(path, abstract)
        if "params" not in restored:
            log.error("checkpoint %s has no 'params' entry (keys: %s)",
                      path, sorted(restored))
            return None
        params = restored["params"]
        # geometry guard: a checkpoint from a different model must not restore
        # "successfully" and blow up later with an opaque XLA shape error
        want = jax.tree.structure(like)
        got = jax.tree.structure(params)
        if want != got:
            log.error("checkpoint %s tree structure does not match the model "
                      "(%s vs %s)", path, got, want)
            return None
        mismatched = [
            f"{np.shape(g)} vs expected {np.shape(w)}"
            for g, w in zip(jax.tree.leaves(params), jax.tree.leaves(like))
            if tuple(np.shape(g)) != tuple(np.shape(w))
        ]
        if mismatched:
            log.error("checkpoint %s has %d shape-mismatched leaves (first: %s)",
                      path, len(mismatched), mismatched[0])
            return None
        return params
    except Exception as exc:
        log.error("orbax restore FAILED for existing checkpoint %s: %s", path, exc)
        return None


def load_metadata(path: str) -> Dict:
    meta_file = Path(path) / "train_meta.json"
    if meta_file.is_file():
        return json.loads(meta_file.read_text())
    return {}
