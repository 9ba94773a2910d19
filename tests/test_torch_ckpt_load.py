"""End-to-end torch-checkpoint import: a reference-format .pt file
(model_state wrapper + timm/HF key spaces) loads through the engine's
load_params path and reproduces the source parameters."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_convert_roundtrip import _to_hf_gpt2_state, _to_timm_state  # noqa: E402


def test_engine_loads_reference_format_pt(tiny_params, tiny_cfg, tmp_path):
    import dataclasses

    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import load_params

    state = {}
    state.update(_to_timm_state(tiny_params["encoder"], tiny_cfg.vit.depth,
                                tiny_cfg.vit.patch_size, 3, "encoder.backbone."))
    state["encoder.proj.weight"] = np.asarray(tiny_params["encoder"]["head"]["w"]).T
    state["encoder.proj.bias"] = np.asarray(tiny_params["encoder"]["head"]["b"])
    state["decoder.mapper.0.weight"] = np.asarray(tiny_params["mapper"]["w"]).T
    state["decoder.mapper.0.bias"] = np.asarray(tiny_params["mapper"]["b"])
    state.update(_to_hf_gpt2_state(tiny_params["decoder"], tiny_cfg.gpt2.n_layer,
                                   "decoder.model."))
    torch_state = {k: torch.tensor(v) for k, v in state.items()}
    ckpt_path = tmp_path / "mapper_finetune.pt"
    torch.save(
        {"model_state": torch_state, "step": 123, "epoch": 2, "best_val": 0.5,
         "args": {"lr": 3e-4}},
        ckpt_path,
    )

    cfg = default_inference_config(ckpt=str(ckpt_path), num_frames=2, image_size=32)
    loaded = load_params(cfg, tiny_cfg, seed=99)  # different seed: random init differs
    np.testing.assert_allclose(
        np.asarray(loaded["mapper"]["w"]), np.asarray(tiny_params["mapper"]["w"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(loaded["decoder"]["wte"]), np.asarray(tiny_params["decoder"]["wte"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(loaded["encoder"]["blocks"]["qkv_w"]),
        np.asarray(tiny_params["encoder"]["blocks"]["qkv_w"]), rtol=1e-6
    )


def test_orbax_checkpoint_roundtrip(tiny_params, tmp_path):
    from video_caption_tpu.training.checkpoint import load_metadata, restore_params, save_checkpoint

    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint(path, tiny_params, step=7, epoch=1, best_val=0.25)
    restored = restore_params(path, tiny_params)
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored["mapper"]["w"]), np.asarray(tiny_params["mapper"]["w"])
    )
    meta = load_metadata(path)
    assert meta["step"] == 7 and meta["best_val"] == 0.25
