"""Generic training loop.

The reference ships an EMPTY src/training/loop.py (SURVEY critical fact #2)
and inlines its loops in each CLI; here the shared loop is implemented once:
jitted step, CSV metrics (events.csv / val.csv — train_caption_mapper.py:
283-297), periodic validation, best-val checkpointing, max-steps cutoff.
"""
from __future__ import annotations

import csv
import logging
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import optax

from video_caption_tpu.training.checkpoint import save_checkpoint

log = logging.getLogger(__name__)


@dataclass
class LoopConfig:
    epochs: int = 1
    max_steps: int = 0
    val_every: int = 200
    max_val_batches: int = 50
    log_every: int = 10
    out_dir: str = "runs/train"
    ckpt_path: str = ""


def make_sgd_step(loss_fn: Callable, optimizer: optax.GradientTransformation):
    """loss_fn(params, batch) -> scalar; returns jitted update step."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def run_training(
    params: Any,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    train_loader: Iterable[Dict],
    val_loader: Optional[Iterable[Dict]] = None,
    cfg: LoopConfig = LoopConfig(),
    batch_transform: Optional[Callable] = None,
) -> Dict[str, Any]:
    out = Path(cfg.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    events, valf = out / "events.csv", out / "val.csv"
    for f, header in ((events, ["step", "loss"]), (valf, ["step", "val_loss"])):
        with f.open("w", newline="") as fh:
            csv.writer(fh).writerow(header)

    step_fn = make_sgd_step(loss_fn, optimizer)
    eval_fn = jax.jit(loss_fn)
    opt_state = optimizer.init(params)
    step, best_val = 0, float("inf")
    t0 = time.time()

    def validate() -> float:
        total, n = 0.0, 0
        for i, batch in enumerate(val_loader):
            if i >= cfg.max_val_batches:
                break
            if batch_transform:
                batch = batch_transform(batch)
            total += float(eval_fn(params, batch))
            n += 1
        return total / max(n, 1)

    stop = False
    for epoch in range(cfg.epochs):
        for batch in train_loader:
            if batch_transform:
                batch = batch_transform(batch)
            params, opt_state, loss = step_fn(params, opt_state, batch)
            step += 1
            lv = float(loss)
            with events.open("a", newline="") as fh:
                csv.writer(fh).writerow([step, lv])
            if step % cfg.log_every == 0:
                log.info("step %d loss %.4f", step, lv)
            if val_loader is not None and cfg.val_every and step % cfg.val_every == 0:
                val = validate()
                with valf.open("a", newline="") as fh:
                    csv.writer(fh).writerow([step, val])
                if val < best_val:
                    best_val = val
                    if cfg.ckpt_path:
                        # stage-1/2 payloads carry opt_state (train_full.py:162-169)
                        save_checkpoint(cfg.ckpt_path, params, step=step, epoch=epoch,
                                        best_val=best_val, opt_state=opt_state)
            if cfg.max_steps and step >= cfg.max_steps:
                stop = True
                break
        if stop:
            break

    if val_loader is not None:
        val = validate()
        with valf.open("a", newline="") as fh:
            csv.writer(fh).writerow([step, val])
        if val < best_val:
            best_val = val
            if cfg.ckpt_path:
                save_checkpoint(cfg.ckpt_path, params, step=step, epoch=cfg.epochs,
                                best_val=best_val, opt_state=opt_state)

    return {"params": params, "steps": step, "best_val": best_val,
            "wall_s": time.time() - t0}
