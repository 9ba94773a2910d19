"""ViT trunk parity against a randomly-initialized torch ViT (HF ViTModel):
validates patchify arithmetic, fused-qkv attention, GELU and LN numerics,
and the converter's layout handling (SURVEY §7 hard part 4)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from video_caption_tpu.models import vit as vt  # noqa: E402
from video_caption_tpu.models.convert import convert_hf_vit  # noqa: E402


@pytest.fixture(scope="module")
def hf_and_jax():
    torch.manual_seed(0)
    hf_cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, image_size=32, patch_size=16,
        layer_norm_eps=1e-6, hidden_act="gelu",
    )
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()
    converted = convert_hf_vit(hf.state_dict(), "", depth=2)
    params = {
        k: ({kk: jnp.asarray(vv) for kk, vv in v.items()} if isinstance(v, dict) else jnp.asarray(v))
        for k, v in converted.items()
    }
    cfg = vt.ViTConfig(
        image_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        mlp_ratio=4, out_dim=16, dtype=jnp.float32,
        gelu_approx=False,  # HF ViT hidden_act="gelu" is exact erf GELU
    )
    return hf, params, cfg


def test_trunk_tokens_match(hf_and_jax):
    hf, params, cfg = hf_and_jax
    rng = np.random.RandomState(0)
    imgs = rng.randn(3, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(imgs)).last_hidden_state.numpy()
    ours = np.asarray(vt.vit_trunk(params, jnp.asarray(imgs), cfg))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_pool_modes(hf_and_jax):
    _, params, cfg = hf_and_jax
    rng = np.random.RandomState(1)
    tokens = jnp.asarray(rng.randn(6, 5, 64).astype(np.float32))  # B=2,T=3
    cls = vt.pool_temporal(tokens, 2, 3, cfg)
    assert cls.shape == (2, 64)
    np.testing.assert_allclose(
        np.asarray(cls),
        np.asarray(tokens)[:, 0, :].reshape(2, 3, 64).mean(1),
        rtol=1e-5, atol=1e-6,
    )
    import dataclasses
    gap_cfg = dataclasses.replace(cfg, pool="gap")
    gap = vt.pool_temporal(tokens, 2, 3, gap_cfg)
    np.testing.assert_allclose(
        np.asarray(gap),
        np.asarray(tokens)[:, 1:, :].mean(1).reshape(2, 3, 64).mean(1),
        rtol=1e-5, atol=1e-6,
    )
