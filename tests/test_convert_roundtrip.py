"""Weight-converter roundtrip: export our pytree to torch-layout state
dicts (timm ViT / HF GPT-2 / full caption-model key spaces), convert back,
and require bit-identical parameters — guards every layout transpose."""
import numpy as np
import pytest

from video_caption_tpu.models.convert import (
    convert_caption_checkpoint,
    convert_hf_gpt2,
    convert_timm_vit,
    merge_params,
    remap_legacy_keys,
)


def _to_timm_state(vit_params, depth, patch, in_chans, prefix=""):
    """Inverse of convert_timm_vit for test fixtures."""
    out_c = vit_params["patch_embed"]["w"].shape[1]
    state = {
        prefix + "patch_embed.proj.weight":
            np.asarray(vit_params["patch_embed"]["w"]).T.reshape(out_c, in_chans, patch, patch),
        prefix + "patch_embed.proj.bias": np.asarray(vit_params["patch_embed"]["b"]),
        prefix + "cls_token": np.asarray(vit_params["cls_token"]),
        prefix + "pos_embed": np.asarray(vit_params["pos_embed"]),
        prefix + "norm.weight": np.asarray(vit_params["norm_scale"]),
        prefix + "norm.bias": np.asarray(vit_params["norm_bias"]),
    }
    blocks = vit_params["blocks"]
    for i in range(depth):
        b = f"{prefix}blocks.{i}."
        state[b + "norm1.weight"] = np.asarray(blocks["ln1_scale"][i])
        state[b + "norm1.bias"] = np.asarray(blocks["ln1_bias"][i])
        state[b + "attn.qkv.weight"] = np.asarray(blocks["qkv_w"][i]).T
        state[b + "attn.qkv.bias"] = np.asarray(blocks["qkv_b"][i])
        state[b + "attn.proj.weight"] = np.asarray(blocks["proj_w"][i]).T
        state[b + "attn.proj.bias"] = np.asarray(blocks["proj_b"][i])
        state[b + "norm2.weight"] = np.asarray(blocks["ln2_scale"][i])
        state[b + "norm2.bias"] = np.asarray(blocks["ln2_bias"][i])
        state[b + "mlp.fc1.weight"] = np.asarray(blocks["fc1_w"][i]).T
        state[b + "mlp.fc1.bias"] = np.asarray(blocks["fc1_b"][i])
        state[b + "mlp.fc2.weight"] = np.asarray(blocks["fc2_w"][i]).T
        state[b + "mlp.fc2.bias"] = np.asarray(blocks["fc2_b"][i])
    return state


def _to_hf_gpt2_state(gpt2_params, n_layer, prefix=""):
    state = {
        prefix + "transformer.wte.weight": np.asarray(gpt2_params["wte"]),
        prefix + "transformer.wpe.weight": np.asarray(gpt2_params["wpe"]),
        prefix + "transformer.ln_f.weight": np.asarray(gpt2_params["lnf_scale"]),
        prefix + "transformer.ln_f.bias": np.asarray(gpt2_params["lnf_bias"]),
    }
    blocks = gpt2_params["blocks"]
    mapping = {
        "ln_1.weight": "ln1_scale", "ln_1.bias": "ln1_bias",
        "attn.c_attn.weight": "attn_w", "attn.c_attn.bias": "attn_b",
        "attn.c_proj.weight": "proj_w", "attn.c_proj.bias": "proj_b",
        "ln_2.weight": "ln2_scale", "ln_2.bias": "ln2_bias",
        "mlp.c_fc.weight": "fc_w", "mlp.c_fc.bias": "fc_b",
        "mlp.c_proj.weight": "out_w", "mlp.c_proj.bias": "out_b",
    }
    for i in range(n_layer):
        for torch_key, ours in mapping.items():
            state[f"{prefix}transformer.h.{i}.{torch_key}"] = np.asarray(blocks[ours][i])
    return state


def _trees_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"keys differ at {path}: {set(a)} vs {set(b)}"
        for k in a:
            _trees_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


def test_timm_vit_roundtrip(tiny_params, tiny_cfg):
    vit = tiny_params["encoder"]
    state = _to_timm_state(vit, tiny_cfg.vit.depth, tiny_cfg.vit.patch_size, 3)
    back = convert_timm_vit(state, "", tiny_cfg.vit.depth)
    reference = {k: v for k, v in vit.items() if k != "head"}
    _trees_equal(reference, back)


def test_hf_gpt2_roundtrip(tiny_params, tiny_cfg):
    dec = tiny_params["decoder"]
    state = _to_hf_gpt2_state(dec, tiny_cfg.gpt2.n_layer)
    back = convert_hf_gpt2(state, "", tiny_cfg.gpt2.n_layer)
    _trees_equal(dec, back)


def test_full_caption_checkpoint_roundtrip(tiny_params, tiny_cfg):
    state = {}
    state.update(_to_timm_state(tiny_params["encoder"], tiny_cfg.vit.depth,
                                tiny_cfg.vit.patch_size, 3, "encoder.backbone."))
    state["encoder.proj.weight"] = np.asarray(tiny_params["encoder"]["head"]["w"]).T
    state["encoder.proj.bias"] = np.asarray(tiny_params["encoder"]["head"]["b"])
    state["decoder.mapper.0.weight"] = np.asarray(tiny_params["mapper"]["w"]).T
    state["decoder.mapper.0.bias"] = np.asarray(tiny_params["mapper"]["b"])
    state.update(_to_hf_gpt2_state(tiny_params["decoder"], tiny_cfg.gpt2.n_layer,
                                   "decoder.model."))
    converted = convert_caption_checkpoint(state, tiny_cfg)
    merged = merge_params(tiny_params, converted)
    _trees_equal(tiny_params, merged)


def test_legacy_vit_key_remap(tiny_params, tiny_cfg):
    state = _to_timm_state(tiny_params["encoder"], tiny_cfg.vit.depth,
                           tiny_cfg.vit.patch_size, 3, "vit.")
    remapped = remap_legacy_keys(state)
    assert all(k.startswith("encoder.backbone.") for k in remapped)


def test_partial_checkpoint_keeps_random_init(tiny_params, tiny_cfg):
    """strict=False semantics: a mapper-only checkpoint leaves the rest."""
    state = {
        "decoder.mapper.0.weight": np.ones_like(np.asarray(tiny_params["mapper"]["w"]).T) * 7,
        "decoder.mapper.0.bias": np.zeros_like(np.asarray(tiny_params["mapper"]["b"])),
    }
    converted = convert_caption_checkpoint(state, tiny_cfg)
    merged = merge_params(tiny_params, converted)
    assert np.all(np.asarray(merged["mapper"]["w"]) == 7)
    np.testing.assert_array_equal(
        np.asarray(merged["decoder"]["wte"]), np.asarray(tiny_params["decoder"]["wte"])
    )
