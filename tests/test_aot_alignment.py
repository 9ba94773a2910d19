"""AOT export/runtime and the accuracy-alignment gate (small geometry)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_caption_tpu.aot import AotRuntime, export_stablehlo


def test_export_and_reload_roundtrip(tmp_path):
    def fn(x, w):
        return jnp.tanh(x @ w)

    x = jnp.ones((2, 8))
    w = jnp.full((8, 4), 0.5)
    path = export_stablehlo(fn, (x, w), str(tmp_path / "fn.shlo"))
    rt = AotRuntime()
    rt.load("fn", path)
    out = rt.run("fn", x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x, w)), rtol=1e-6)


def test_aot_runtime_unknown_program(tmp_path):
    rt = AotRuntime()
    with pytest.raises(KeyError):
        rt.run("nope", jnp.ones(1))


def test_accuracy_alignment_small():
    from video_caption_tpu.bench.accuracy_alignment import check_alignment

    results = check_alignment(image_size=32, num_frames=2)
    assert results["encoder jit-fp32 vs eager"]["ok"]
    assert results["encoder bf16 vs fp32"]["ok"]
    assert results["all_ok"], results
