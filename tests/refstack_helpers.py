"""Helpers to run the ACTUAL reference stack (/root/reference) on CPU for
token-for-token differential tests.

The environment has no network and no timm/torchvision, so:

- a synthetic-but-valid GPT-2 byte-level BPE vocab (256 byte tokens + trained
  merges + <|endoftext|>) is written to disk; BOTH stacks load the same
  vocab.json/merges.txt (GPT2TokenizerFast on the reference side, our
  from-scratch BPE via VIDEO_CAPTION_TOKENIZER_DIR on ours),
- a random-init HF GPT2LMHeadModel is saved locally so the reference's
  ``from_pretrained(gpt2_name)`` resolves offline,
- ``timm`` is stubbed with a faithful torch ViT that reproduces timm's
  ``vision_transformer`` module/parameter naming and forward math exactly
  (pre-norm blocks, fused qkv, GELU MLP, eps=1e-6 LNs, cls+pos embed, final
  norm) — so the reference's ViTFrameEncoder wrapper logic (fusion toggles,
  pooling, proj head) runs unmodified and emits timm-named state dicts,
- ``torchvision`` is stubbed with ``models`` names (never called when timm
  is importable) and faithful ``transforms`` (Resize/ToTensor/Normalize on
  PIL inputs are exact: PIL bilinear resize, /255, mean/std).

Everything else — VideoCaptionModel, GPT2TextDecoder, HF generate,
clean_text, scoring — is the reference's real code.
"""
from __future__ import annotations

import collections
import json
import sys
import types
from pathlib import Path

REFERENCE_ROOT = "/root/reference"

# geometry shared by the stand-in ViT and the JAX side (small for CPU speed;
# structure identical to vit_base_patch16_224)
VIT_GEOMETRY = dict(embed_dim=128, depth=2, num_heads=4, patch_size=16)


# ---------------------------------------------------------------------------
# synthetic GPT-2 BPE assets
# ---------------------------------------------------------------------------

def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAC + 1))
          + list(range(0xAE, 0xFF + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def build_synthetic_gpt2_vocab(dirpath: Path, corpus: str, n_merges: int = 32):
    """Train a tiny-but-real byte-level BPE on ``corpus``; write vocab.json +
    merges.txt in the exact GPT-2 format. Returns vocab size."""
    import regex as re

    split_pat = re.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )
    byte_enc = _bytes_to_unicode()
    words = collections.Counter()
    for chunk in split_pat.findall(corpus):
        mapped = "".join(byte_enc[b] for b in chunk.encode("utf-8"))
        words[tuple(mapped)] += 1

    vocab = {}
    for b in range(256):
        vocab[byte_enc[b]] = len(vocab)

    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, cnt in words.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += cnt
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        vocab[best[0] + best[1]] = len(vocab)
        new_words = collections.Counter()
        for word, cnt in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    out.append(word[i] + word[i + 1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += cnt
        words = new_words

    vocab["<|endoftext|>"] = len(vocab)
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (dirpath / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8",
    )
    (dirpath / "tokenizer_config.json").write_text(
        json.dumps({"model_max_length": 1024, "tokenizer_class": "GPT2Tokenizer"})
    )
    return len(vocab)


def build_local_gpt2_model_dir(dirpath: Path, vocab_size: int, n_embd: int = 128,
                               n_layer: int = 2, n_head: int = 4, seed: int = 0):
    """Random-init GPT2LMHeadModel saved to ``dirpath`` for offline
    ``from_pretrained``."""
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(seed)
    cfg = GPT2Config(
        vocab_size=vocab_size, n_positions=512, n_embd=n_embd,
        n_layer=n_layer, n_head=n_head,
        bos_token_id=vocab_size - 1, eos_token_id=vocab_size - 1,
    )
    model = GPT2LMHeadModel(cfg).eval()
    model.save_pretrained(str(dirpath), safe_serialization=True)
    return cfg


# ---------------------------------------------------------------------------
# faithful timm ViT stand-in (timm naming + math; random init)
# ---------------------------------------------------------------------------

def _build_fake_timm_module():
    import torch
    import torch.nn as nn

    class Attention(nn.Module):
        def __init__(self, dim, num_heads):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=True)
            self.proj = nn.Linear(dim, dim)
            self.fused_attn = False  # ViTFrameEncoder flips this to True

        def forward(self, x, attn_mask=None):
            B, N, C = x.shape
            qkv = (self.qkv(x)
                   .reshape(B, N, 3, self.num_heads, self.head_dim)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv.unbind(0)
            if self.fused_attn:
                x = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            else:
                attn = (q @ k.transpose(-2, -1)) * self.scale
                attn = attn.softmax(dim=-1)
                x = attn @ v
            x = x.transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = nn.Linear(dim, hidden)
            self.act = nn.GELU()  # ViTFrameEncoder sets approximate='tanh'
            self.fc2 = nn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class Block(nn.Module):
        def __init__(self, dim, num_heads):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.attn = Attention(dim, num_heads)
            self.ls1 = nn.Identity()
            self.norm2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp(dim, dim * 4)
            self.ls2 = nn.Identity()

        def forward(self, x, attn_mask=None):
            x = x + self.ls1(self.attn(self.norm1(x), attn_mask=attn_mask))
            x = x + self.ls2(self.mlp(self.norm2(x)))
            return x

    class PatchEmbed(nn.Module):
        def __init__(self, patch_size, in_chans, embed_dim):
            super().__init__()
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)  # [B, N, C]

    class VisionTransformer(nn.Module):
        def __init__(self, img_size=224, patch_size=16, embed_dim=128,
                     depth=2, num_heads=4):
            super().__init__()
            num_patches = (img_size // patch_size) ** 2
            self.num_features = embed_dim
            self.patch_embed = PatchEmbed(patch_size, 3, embed_dim)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
            self.pos_embed = nn.Parameter(
                torch.randn(1, num_patches + 1, embed_dim) * 0.02)
            self.blocks = nn.ModuleList(
                Block(embed_dim, num_heads) for _ in range(depth))
            self.norm = nn.LayerNorm(embed_dim, eps=1e-6)
            nn.init.trunc_normal_(self.cls_token, std=0.02)

        def forward_features(self, x):
            x = self.patch_embed(x)
            cls = self.cls_token.expand(x.shape[0], -1, -1)
            x = torch.cat([cls, x], dim=1) + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.norm(x)

        def forward(self, x):
            return self.forward_features(x)

    timm_mod = types.ModuleType("timm")

    def create_model(model_name, pretrained=False, num_classes=0,
                     global_pool="", **kwargs):
        g = VIT_GEOMETRY
        return VisionTransformer(
            img_size=224, patch_size=g["patch_size"], embed_dim=g["embed_dim"],
            depth=g["depth"], num_heads=g["num_heads"],
        )

    timm_mod.create_model = create_model
    timm_mod.__version__ = "0.0-fake-differential"
    return timm_mod


def _build_fake_torchvision_modules():
    """torchvision.models names (unused when timm importable) + faithful
    transforms for PIL inputs."""
    import numpy as np
    import torch

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")

    class ViT_B_16_Weights:  # only referenced, never instantiated
        IMAGENET1K_V1 = None

    def vit_b_16(weights=None):
        raise RuntimeError("torchvision fallback should not run (timm stub present)")

    models.ViT_B_16_Weights = ViT_B_16_Weights
    models.vit_b_16 = vit_b_16

    transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, img):
            for t in self.ts:
                img = t(img)
            return img

    class Resize:
        def __init__(self, size):
            self.size = size if isinstance(size, (tuple, list)) else (size, size)

        def __call__(self, img):
            from PIL import Image
            h, w = self.size
            return img.resize((w, h), Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.uint8).astype(np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    transforms.Compose = Compose
    transforms.Resize = Resize
    transforms.ToTensor = ToTensor
    transforms.Normalize = Normalize
    tv.models = models
    tv.transforms = transforms
    return tv, models, transforms


_INSTALLED = False


_REF_INF_MODULE = None


def install_reference_stack():
    """Stub timm/torchvision and put /root/reference on sys.path. Returns the
    reference ``experiments.inference`` module (the standalone inference
    entry, experiments/inference.py:312-385).

    The reference file has a mojibake-corrupted string inside ``parse_args``
    (a CJK help text whose closing quote was eaten by an encoding mangle),
    so the module cannot be imported whole; everything through
    ``run_one_video`` parses cleanly, so the source is exec'd truncated at
    ``def parse_args`` — zero reference lines are modified."""
    global _INSTALLED, _REF_INF_MODULE
    if not _INSTALLED:
        sys.modules["timm"] = _build_fake_timm_module()
        tv, models, transforms = _build_fake_torchvision_modules()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.transforms"] = transforms
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        _INSTALLED = True
    if _REF_INF_MODULE is None:
        path = f"{REFERENCE_ROOT}/experiments/inference.py"
        src = open(path, encoding="utf-8-sig", errors="replace").read()
        src = src[: src.find("def parse_args")]
        mod = types.ModuleType("experiments.inference")
        mod.__file__ = path
        exec(compile(src, path, "exec"), mod.__dict__)
        _REF_INF_MODULE = mod
    return _REF_INF_MODULE
