"""PyTorch checkpoint -> JAX parameter-pytree converter.

Reads reference-format checkpoints (``{"model_state": state_dict, "step",
"epoch", "best_val", "args"}`` — src/cli/train_caption_mapper.py:301-305)
and converts timm-ViT + HF-GPT-2 state dicts into this package's pytrees,
handling the layout traps called out in SURVEY §7 hard part 4:

- timm patch-embed conv ``[out, in, kh, kw]`` -> flattened ``[in*kh*kw, out]``
  matmul weight (per-output-channel order (in, kh, kw) matches our patchify),
- torch ``nn.Linear`` weights ``[out, in]`` -> transposed to ``[in, out]``,
- HF GPT-2 Conv1D weights are already ``[in, out]`` — NOT transposed,
- fused qkv ordering (3, n_head, head_dim) identical on both sides,
- ``model_state`` unwrap (core/models/model_loader.py:74-75) and legacy
  ``vit.*`` -> ``encoder.backbone.*`` key remap (tools/debug_chain.py:48-60).

torch is used only here (host-side, CPU) — never on the compute path.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Mapping

import numpy as np

from video_caption_tpu.models.caption_model import CaptionModelConfig

log = logging.getLogger(__name__)

StateDict = Mapping[str, Any]


def _np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Safe checkpoint load with the reference's fallback chain
    (model_loader.py:31-40): weights_only=True -> TypeError -> plain load."""
    import torch

    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:
        state = torch.load(path, map_location="cpu")
    except Exception:
        # weights_only=False executes arbitrary pickle code — require explicit
        # opt-in rather than silently mirroring the reference's fallback chain.
        import os

        if os.environ.get("VCT_ALLOW_UNSAFE_PICKLE", "") != "1":
            raise RuntimeError(
                f"checkpoint {path} failed the safe (weights_only=True) load; "
                "loading it requires unpickling arbitrary code. Set "
                "VCT_ALLOW_UNSAFE_PICKLE=1 to allow this for trusted files."
            )
        log.warning(
            "UNSAFE LOAD: %s is being unpickled with weights_only=False "
            "(VCT_ALLOW_UNSAFE_PICKLE=1) — this executes code from the file",
            path,
        )
        state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model_state" in state:
        state = state["model_state"]
    state = remap_legacy_keys(state)
    return {k: _np(v) for k, v in state.items()}


def remap_legacy_keys(state: StateDict) -> Dict[str, Any]:
    """``vit.*`` -> ``encoder.backbone.*`` legacy remap (debug_chain.py:48-60)."""
    out = {}
    for key, val in state.items():
        if key.startswith("vit."):
            key = "encoder.backbone." + key[len("vit."):]
        out[key] = val
    return out


def _linear(state: StateDict, prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> [in, out] matmul weight."""
    return {
        "w": _np(state[f"{prefix}.weight"]).T.copy(),
        "b": _np(state[f"{prefix}.bias"]),
    }


def convert_timm_vit(state: StateDict, prefix: str = "", depth: int = 12) -> Dict[str, Any]:
    """timm ``vit_base_patch16_224`` keys -> vit.py pytree (stacked blocks)."""
    g = lambda k: _np(state[prefix + k])  # noqa: E731
    conv_w = g("patch_embed.proj.weight")           # [out, in, kh, kw]
    out_c = conv_w.shape[0]
    params: Dict[str, Any] = {
        "patch_embed": {
            "w": conv_w.reshape(out_c, -1).T.copy(),  # [(in kh kw), out]
            "b": g("patch_embed.proj.bias"),
        },
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "norm_scale": g("norm.weight"),
        "norm_bias": g("norm.bias"),
    }
    blocks: Dict[str, list] = {k: [] for k in (
        "ln1_scale", "ln1_bias", "qkv_w", "qkv_b", "proj_w", "proj_b",
        "ln2_scale", "ln2_bias", "fc1_w", "fc1_b", "fc2_w", "fc2_b",
    )}
    for i in range(depth):
        b = f"blocks.{i}."
        blocks["ln1_scale"].append(g(b + "norm1.weight"))
        blocks["ln1_bias"].append(g(b + "norm1.bias"))
        blocks["qkv_w"].append(g(b + "attn.qkv.weight").T)
        blocks["qkv_b"].append(g(b + "attn.qkv.bias"))
        blocks["proj_w"].append(g(b + "attn.proj.weight").T)
        blocks["proj_b"].append(g(b + "attn.proj.bias"))
        blocks["ln2_scale"].append(g(b + "norm2.weight"))
        blocks["ln2_bias"].append(g(b + "norm2.bias"))
        blocks["fc1_w"].append(g(b + "mlp.fc1.weight").T)
        blocks["fc1_b"].append(g(b + "mlp.fc1.bias"))
        blocks["fc2_w"].append(g(b + "mlp.fc2.weight").T)
        blocks["fc2_b"].append(g(b + "mlp.fc2.bias"))
    params["blocks"] = {k: np.stack(v).copy() for k, v in blocks.items()}
    return params


def convert_hf_vit(state: StateDict, prefix: str = "", depth: int = 12) -> Dict[str, Any]:
    """HF ``ViTModel`` keys -> vit.py pytree (test/parity path; production
    checkpoints use the timm layout handled by convert_timm_vit). HF stores
    separate q/k/v Linears — fused here into the [in, 3h] qkv matmul."""
    g = lambda k: _np(state[prefix + k])  # noqa: E731
    conv_w = g("embeddings.patch_embeddings.projection.weight")
    out_c = conv_w.shape[0]
    params: Dict[str, Any] = {
        "patch_embed": {
            "w": conv_w.reshape(out_c, -1).T.copy(),
            "b": g("embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": g("embeddings.cls_token"),
        "pos_embed": g("embeddings.position_embeddings"),
        "norm_scale": g("layernorm.weight"),
        "norm_bias": g("layernorm.bias"),
    }
    blocks: Dict[str, list] = {k: [] for k in (
        "ln1_scale", "ln1_bias", "qkv_w", "qkv_b", "proj_w", "proj_b",
        "ln2_scale", "ln2_bias", "fc1_w", "fc1_b", "fc2_w", "fc2_b",
    )}
    for i in range(depth):
        b = f"encoder.layer.{i}."
        q_w = g(b + "attention.attention.query.weight").T
        k_w = g(b + "attention.attention.key.weight").T
        v_w = g(b + "attention.attention.value.weight").T
        blocks["ln1_scale"].append(g(b + "layernorm_before.weight"))
        blocks["ln1_bias"].append(g(b + "layernorm_before.bias"))
        blocks["qkv_w"].append(np.concatenate([q_w, k_w, v_w], axis=1))
        blocks["qkv_b"].append(np.concatenate([
            g(b + "attention.attention.query.bias"),
            g(b + "attention.attention.key.bias"),
            g(b + "attention.attention.value.bias"),
        ]))
        blocks["proj_w"].append(g(b + "attention.output.dense.weight").T)
        blocks["proj_b"].append(g(b + "attention.output.dense.bias"))
        blocks["ln2_scale"].append(g(b + "layernorm_after.weight"))
        blocks["ln2_bias"].append(g(b + "layernorm_after.bias"))
        blocks["fc1_w"].append(g(b + "intermediate.dense.weight").T)
        blocks["fc1_b"].append(g(b + "intermediate.dense.bias"))
        blocks["fc2_w"].append(g(b + "output.dense.weight").T)
        blocks["fc2_b"].append(g(b + "output.dense.bias"))
    params["blocks"] = {k: np.stack(v).copy() for k, v in blocks.items()}
    return params


def convert_hf_gpt2(state: StateDict, prefix: str = "", n_layer: int = 12) -> Dict[str, Any]:
    """HF ``GPT2LMHeadModel`` keys -> gpt2.py pytree. Conv1D weights are
    stored [in, out] already (the classic transposed-Linear trap)."""
    g = lambda k: _np(state[prefix + k])  # noqa: E731
    params: Dict[str, Any] = {
        "wte": g("transformer.wte.weight"),
        "wpe": g("transformer.wpe.weight"),
        "lnf_scale": g("transformer.ln_f.weight"),
        "lnf_bias": g("transformer.ln_f.bias"),
    }
    blocks: Dict[str, list] = {k: [] for k in (
        "ln1_scale", "ln1_bias", "attn_w", "attn_b", "proj_w", "proj_b",
        "ln2_scale", "ln2_bias", "fc_w", "fc_b", "out_w", "out_b",
    )}
    for i in range(n_layer):
        b = f"transformer.h.{i}."
        blocks["ln1_scale"].append(g(b + "ln_1.weight"))
        blocks["ln1_bias"].append(g(b + "ln_1.bias"))
        blocks["attn_w"].append(g(b + "attn.c_attn.weight"))   # Conv1D: [in, out]
        blocks["attn_b"].append(g(b + "attn.c_attn.bias"))
        blocks["proj_w"].append(g(b + "attn.c_proj.weight"))
        blocks["proj_b"].append(g(b + "attn.c_proj.bias"))
        blocks["ln2_scale"].append(g(b + "ln_2.weight"))
        blocks["ln2_bias"].append(g(b + "ln_2.bias"))
        blocks["fc_w"].append(g(b + "mlp.c_fc.weight"))
        blocks["fc_b"].append(g(b + "mlp.c_fc.bias"))
        blocks["out_w"].append(g(b + "mlp.c_proj.weight"))
        blocks["out_b"].append(g(b + "mlp.c_proj.bias"))
    params["blocks"] = {k: np.stack(v).copy() for k, v in blocks.items()}
    return params


def convert_caption_checkpoint(
    state: StateDict, cfg: CaptionModelConfig
) -> Dict[str, Any]:
    """Full VideoCaptionModel state dict -> caption_model.py pytree.

    Expected key families (src/models/caption_model.py):
    ``encoder.backbone.*`` (timm), ``encoder.proj.*`` (768->256 head),
    ``proj.*`` (optional MLP adapter), ``decoder.mapper.0.*`` (prefix mapper),
    ``decoder.model.*`` (HF GPT-2). Missing families are skipped with a
    warning, mirroring the loader's strict=False stance
    (model_loader.py:76-80).
    """
    state = remap_legacy_keys(state)
    params: Dict[str, Any] = {}

    if any(k.startswith("encoder.backbone.") for k in state):
        enc = convert_timm_vit(state, "encoder.backbone.", cfg.vit.depth)
        if "encoder.proj.weight" in state:
            enc["head"] = _linear(state, "encoder.proj")
        params["encoder"] = enc
    else:
        log.warning("checkpoint has no encoder.backbone.* keys; encoder not converted")

    if "decoder.mapper.0.weight" in state:
        params["mapper"] = _linear(state, "decoder.mapper.0")
    elif "decoder.mapper.weight" in state:
        params["mapper"] = _linear(state, "decoder.mapper")
    else:
        log.warning("checkpoint has no decoder.mapper.* keys; mapper not converted")

    if any(k.startswith("decoder.model.") for k in state):
        params["decoder"] = convert_hf_gpt2(state, "decoder.model.", cfg.gpt2.n_layer)
    else:
        log.warning("checkpoint has no decoder.model.* keys; decoder not converted")

    if "proj.0.weight" in state:  # MLP adapter variant (caption_model.py:60-66)
        params["proj_mlp"] = {
            "fc1": _linear(state, "proj.0"),
            "fc2": _linear(state, "proj.2"),
        }
    return params


def export_torch_state(params: Dict[str, Any], cfg: CaptionModelConfig) -> Dict[str, Any]:
    """Inverse conversion: this package's pytree -> the reference's torch
    state-dict key space (timm ViT + HF GPT-2 + mapper), so models trained
    here can be loaded BACK by ``VideoCaptionModel.load_state_dict``
    (migration in both directions). Returns numpy arrays; pair with
    ``save_torch_checkpoint`` for the on-disk format."""
    out: Dict[str, np.ndarray] = {}

    def a(x):
        return np.asarray(x, np.float32)

    enc = params.get("encoder")
    if enc:
        p = cfg.vit.patch_size
        w = a(enc["patch_embed"]["w"])                     # [(in kh kw), out]
        out["encoder.backbone.patch_embed.proj.weight"] = (
            w.T.reshape(-1, cfg.vit.in_chans, p, p)
        )
        out["encoder.backbone.patch_embed.proj.bias"] = a(enc["patch_embed"]["b"])
        out["encoder.backbone.cls_token"] = a(enc["cls_token"])
        out["encoder.backbone.pos_embed"] = a(enc["pos_embed"])
        out["encoder.backbone.norm.weight"] = a(enc["norm_scale"])
        out["encoder.backbone.norm.bias"] = a(enc["norm_bias"])
        blocks = enc["blocks"]
        names = (
            ("ln1_scale", "norm1.weight", False), ("ln1_bias", "norm1.bias", False),
            ("qkv_w", "attn.qkv.weight", True), ("qkv_b", "attn.qkv.bias", False),
            ("proj_w", "attn.proj.weight", True), ("proj_b", "attn.proj.bias", False),
            ("ln2_scale", "norm2.weight", False), ("ln2_bias", "norm2.bias", False),
            ("fc1_w", "mlp.fc1.weight", True), ("fc1_b", "mlp.fc1.bias", False),
            ("fc2_w", "mlp.fc2.weight", True), ("fc2_b", "mlp.fc2.bias", False),
        )
        for i in range(cfg.vit.depth):
            for ours, theirs, transpose in names:
                v = a(blocks[ours][i])
                out[f"encoder.backbone.blocks.{i}.{theirs}"] = v.T if transpose else v
                # ViTFrameEncoder aliases self.blocks = backbone.blocks
                # (video_encoder.py:73), so the reference state dict carries
                # the block tensors under BOTH prefixes
                out[f"encoder.blocks.{i}.{theirs}"] = out[f"encoder.backbone.blocks.{i}.{theirs}"]
        if "head" in enc:
            out["encoder.proj.weight"] = a(enc["head"]["w"]).T
            out["encoder.proj.bias"] = a(enc["head"]["b"])

    if "mapper" in params:
        out["decoder.mapper.0.weight"] = a(params["mapper"]["w"]).T
        out["decoder.mapper.0.bias"] = a(params["mapper"]["b"])

    dec = params.get("decoder")
    if dec:
        out["decoder.model.transformer.wte.weight"] = a(dec["wte"])
        out["decoder.model.transformer.wpe.weight"] = a(dec["wpe"])
        out["decoder.model.transformer.ln_f.weight"] = a(dec["lnf_scale"])
        out["decoder.model.transformer.ln_f.bias"] = a(dec["lnf_bias"])
        out["decoder.model.lm_head.weight"] = a(dec["wte"])   # tied
        blocks = dec["blocks"]
        names = (
            ("ln1_scale", "ln_1.weight"), ("ln1_bias", "ln_1.bias"),
            ("attn_w", "attn.c_attn.weight"), ("attn_b", "attn.c_attn.bias"),
            ("proj_w", "attn.c_proj.weight"), ("proj_b", "attn.c_proj.bias"),
            ("ln2_scale", "ln_2.weight"), ("ln2_bias", "ln_2.bias"),
            ("fc_w", "mlp.c_fc.weight"), ("fc_b", "mlp.c_fc.bias"),
            ("out_w", "mlp.c_proj.weight"), ("out_b", "mlp.c_proj.bias"),
        )
        for i in range(cfg.gpt2.n_layer):
            for ours, theirs in names:
                # HF Conv1D stores [in, out] — our native layout, no transpose
                out[f"decoder.model.transformer.h.{i}.{theirs}"] = a(blocks[ours][i])

    if "proj_mlp" in params:  # MLP adapter (reference proj_hidden>0)
        m = params["proj_mlp"]
        out["proj.0.weight"] = a(m["fc1"]["w"]).T
        out["proj.0.bias"] = a(m["fc1"]["b"])
        out["proj.2.weight"] = a(m["fc2"]["w"]).T
        out["proj.2.bias"] = a(m["fc2"]["b"])
    if "proj" in params:
        log.warning(
            "params carry a Linear adapter ('proj') with no reference key "
            "space (the reference folds the dim change into encoder.proj); "
            "NOT exported"
        )
    return out


def save_torch_checkpoint(path: str, params: Dict[str, Any], cfg: CaptionModelConfig,
                          step: int = 0, epoch: int = 0,
                          best_val: float = float("inf"), args=None) -> None:
    """Write a reference-format checkpoint (train_caption_mapper.py:301-305:
    {"model_state", "step", "epoch", "best_val", "args"}) loadable by the
    reference's model_loader AND by this package's load_torch_checkpoint."""
    import torch

    state = {k: torch.from_numpy(v.copy()) for k, v in export_torch_state(params, cfg).items()}
    torch.save(
        {"model_state": state, "step": step, "epoch": epoch,
         "best_val": best_val, "args": args or {}},
        path,
    )
    log.info("saved reference-format checkpoint to %s (%d tensors)", path, len(state))


def merge_params(init: Dict[str, Any], converted: Dict[str, Any]) -> Dict[str, Any]:
    """Overlay converted families onto a randomly-initialized pytree, keeping
    random init for anything the checkpoint lacks (strict=False semantics)."""
    import jax.numpy as jnp

    def overlay(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                out[k] = overlay(dst[k], v)
            else:
                out[k] = jnp.asarray(v, jnp.float32)
        return out

    if "proj_mlp" in converted and "proj_mlp" not in init:
        log.warning(
            "checkpoint carries an MLP adapter (proj.0/proj.2) but the model "
            "was configured with proj_hidden=0 — adapter weights will be "
            "loaded anyway and applied by encode_video; set "
            "CaptionModelConfig.proj_hidden to silence this"
        )
    merged = overlay(init, converted)
    return merged
