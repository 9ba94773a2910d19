"""Training loop + optimizer: CSV metrics, best-val checkpointing, LR
masks (frozen vs trainable groups), mapper-trainer smoke over the mesh."""
import csv

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from video_caption_tpu.models import toy
from video_caption_tpu.training import optim as topt
from video_caption_tpu.training.loop import LoopConfig, run_training


def _batches(n, vocab=128, seed=0):
    rng = np.random.RandomState(seed)
    return [
        {
            "video": rng.randn(2, 2, 3, 16, 16).astype(np.float32),
            "caption_ids": rng.randint(1, vocab - 1, (2, 6)).astype(np.int32),
            "attention_mask": np.ones((2, 6), np.int32),
        }
        for _ in range(n)
    ]


def test_run_training_emits_metrics_and_checkpoint(tmp_path):
    cfg = toy.ToyConfig()
    params = toy.init_simple_align(jax.random.PRNGKey(0), cfg)

    def loss_fn(p, batch):
        return toy.simple_align_loss(p, batch["video"], batch["caption_ids"],
                                     batch["attention_mask"])

    result = run_training(
        params, loss_fn, optax.adam(1e-2), _batches(12), _batches(3, seed=1),
        cfg=LoopConfig(epochs=2, val_every=6, out_dir=str(tmp_path / "run"),
                       ckpt_path=str(tmp_path / "ckpt")),
    )
    with (tmp_path / "run" / "events.csv").open() as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 24  # 12 batches x 2 epochs
    with (tmp_path / "run" / "val.csv").open() as fh:
        val_rows = list(csv.DictReader(fh))
    assert len(val_rows) >= 4
    assert (tmp_path / "ckpt" / "train_meta.json").exists()
    assert result["best_val"] < float("inf")
    # train loss should drop substantially over 24 steps of adam on a toy task
    assert float(rows[-1]["loss"]) < float(rows[0]["loss"])


def test_mapper_lr_tree_freezes_backbone(tiny_params, tiny_cfg):
    lr_tree = topt.mapper_lr_tree(tiny_params, lr=1e-3, lr_gpt2=1e-5,
                                  unfreeze_last=1, n_layer=tiny_cfg.gpt2.n_layer)
    assert float(lr_tree["mapper"]["w"]) == pytest.approx(1e-3)
    # encoder frozen
    assert float(lr_tree["encoder"]["cls_token"]) == 0.0
    # decoder blocks: first layer frozen, last layer at lr_gpt2
    depth_mask = np.asarray(lr_tree["decoder"]["blocks"]["attn_w"]).reshape(-1)
    assert depth_mask[0] == 0.0 and depth_mask[-1] == pytest.approx(1e-5)
    # embeddings frozen
    assert float(lr_tree["decoder"]["wte"]) == 0.0


def test_optimizer_updates_only_trainable(tiny_params, tiny_cfg):
    from video_caption_tpu.models import caption_model as cm

    lr_tree = topt.mapper_lr_tree(tiny_params, lr=1e-2, lr_gpt2=0.0,
                                  unfreeze_last=0, n_layer=tiny_cfg.gpt2.n_layer)
    opt = topt.build_optimizer(lr_tree)
    state = opt.init(tiny_params)
    video = jnp.asarray(np.random.RandomState(0).randn(1, 2, 3, 32, 32), jnp.float32)
    ids = jnp.asarray([[3, 4, 5, 127]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)

    grads = jax.grad(lambda p: cm.compute_loss(p, video, ids, mask, tiny_cfg))(tiny_params)
    updates, _ = opt.update(grads, state, tiny_params)
    new_params = optax.apply_updates(tiny_params, updates)

    # mapper moved
    assert not np.allclose(np.asarray(new_params["mapper"]["w"]),
                           np.asarray(tiny_params["mapper"]["w"]))
    # encoder + decoder untouched
    np.testing.assert_array_equal(np.asarray(new_params["encoder"]["cls_token"]),
                                  np.asarray(tiny_params["encoder"]["cls_token"]))
    np.testing.assert_array_equal(np.asarray(new_params["decoder"]["wte"]),
                                  np.asarray(tiny_params["decoder"]["wte"]))


def test_mapper_trainer_fit_smoke(tiny_params, tiny_cfg, tmp_path):
    from video_caption_tpu.config import MeshConfig
    from video_caption_tpu.parallel import make_mesh
    from video_caption_tpu.training.mapper_trainer import MapperTrainer, TrainArgs

    mesh = make_mesh(MeshConfig(data=2, model=1), jax.devices()[:2])
    trainer = MapperTrainer(
        tiny_cfg, tiny_params,
        TrainArgs(epochs=1, max_steps=4, val_every=2,
                  out_dir=str(tmp_path / "run"), ckpt_path=str(tmp_path / "ckpt")),
        mesh=mesh,
    )
    batches = [
        {k: v for k, v in b.items()} for b in _batches(4)
    ]
    # reshape tiny video to the tiny_cfg geometry (32x32)
    for b in batches:
        b["video"] = np.random.RandomState(0).randn(2, 2, 3, 32, 32).astype(np.float32)
    stats = trainer.fit(batches, batches[:2])
    assert stats["steps"] == 4
    assert (tmp_path / "run" / "events.csv").exists()


def test_freeze_encoder_stop_gradient(tiny_params, tiny_cfg):
    """freeze_encoder: loss value identical, encoder grads exactly zero,
    mapper grads unchanged."""
    import dataclasses

    from video_caption_tpu.models import caption_model as cm

    video = jnp.asarray(np.random.RandomState(0).randn(1, 2, 3, 32, 32), jnp.float32)
    ids = jnp.asarray([[3, 4, 5, 127]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    frozen_cfg = dataclasses.replace(tiny_cfg, freeze_encoder=True)

    l0 = float(cm.compute_loss(tiny_params, video, ids, mask, tiny_cfg))
    l1 = float(cm.compute_loss(tiny_params, video, ids, mask, frozen_cfg))
    assert abs(l0 - l1) < 1e-6

    g_frozen = jax.grad(lambda p: cm.compute_loss(p, video, ids, mask, frozen_cfg))(tiny_params)
    g_full = jax.grad(lambda p: cm.compute_loss(p, video, ids, mask, tiny_cfg))(tiny_params)
    assert float(jnp.sum(jnp.abs(g_frozen["encoder"]["cls_token"]))) == 0.0
    assert float(jnp.sum(jnp.abs(g_full["encoder"]["cls_token"]))) > 0.0
    np.testing.assert_allclose(np.asarray(g_frozen["mapper"]["w"]),
                               np.asarray(g_full["mapper"]["w"]), rtol=1e-5, atol=1e-7)
