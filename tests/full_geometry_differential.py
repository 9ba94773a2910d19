"""One-off: the differential parity check at FULL production geometry
(ViT-B/16 depth 12 + GPT-2 124M) on CPU — checks for depth-dependent
numeric drift the depth-2 suite geometry can't see."""
import sys, os
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np
import torch
import refstack_helpers as rsh
rsh.VIT_GEOMETRY = dict(embed_dim=768, depth=12, num_heads=12, patch_size=16)

from pathlib import Path
import tempfile
assets = Path(tempfile.mkdtemp(prefix="fullgeom_"))
CORPUS = ("State the main action in one short sentence: "
          "Write a short, natural caption: a man is playing a guitar on the stage ")
vocab_size = rsh.build_synthetic_gpt2_vocab(assets, CORPUS, n_merges=32)
rsh.build_local_gpt2_model_dir(assets, vocab_size, n_embd=768, n_layer=12, n_head=12)
os.environ["VIDEO_CAPTION_TOKENIZER_DIR"] = str(assets)
import video_caption_tpu.decode.tokenizer as tok_mod
tok_mod._TOKENIZER = None
refinf = rsh.install_reference_stack()
torch.manual_seed(7)
model = refinf.VideoCaptionModel(vit_name="vit_base_patch16_224", gpt2_name=str(assets),
                                 cond_mode="prefix", prefix_len=4, freeze_vit=True).eval()
ckpt = assets / "ck.pt"
torch.save({"model_state": model.state_dict()}, str(ckpt))
frames = Path(tempfile.mkdtemp(prefix="fullgeom_frames_"))
from PIL import Image
rng = np.random.RandomState(42)
for i in range(20):
    Image.fromarray(rng.randint(0, 255, (240, 320, 3), np.uint8)).save(frames / f"frame_{i:05d}.jpg")
print("running reference...", flush=True)
ref = refinf.run_one_video(str(frames), str(ckpt), gpt2_name=str(assets), num_frames=8,
                           preset1="precise", preset2="detailed", preset3="precise")
print("ref:", ref, flush=True)

import jax.numpy as jnp
from video_caption_tpu.models import caption_model as cm, gpt2 as g2, vit as vt
from video_caption_tpu.config import InferenceConfig
from video_caption_tpu.engine import InferenceEngine
mc = cm.CaptionModelConfig(
    vit=vt.ViTConfig(dtype=jnp.float32, gelu_approx=True),
    gpt2=g2.GPT2Config(vocab_size=vocab_size, dtype=jnp.float32),
    prefix_len=4, video_dim=256)
eng = InferenceEngine(InferenceConfig(ckpt=str(ckpt), num_frames=8,
                                      preset1="precise", preset2="detailed", preset3="precise"),
                      model_cfg=mc)
ours = eng.infer(str(frames)).to_api_dict()
print("ours:", ours, flush=True)
for k in ("S1", "S2", "S3"):
    assert ours[k] == ref[k], f"{k} mismatch:\n ref={ref[k]!r}\n our={ours[k]!r}"
assert ours["BEST"]["text"] == ref["BEST"]["text"]
print("FULL-GEOMETRY-DIFFERENTIAL-OK", flush=True)
