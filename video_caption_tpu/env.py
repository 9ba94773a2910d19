"""Dependency and accelerator gates (reference: core/env.py:20-74).

Named dependency groups asserted before model load; the TPU check replaces
the reference's CUDA availability probe.
"""
from __future__ import annotations

import importlib
import os
from typing import Iterable


class RuntimeNotReady(RuntimeError):
    pass


_CORE_DEPS = ("jax", "jax.numpy", "numpy", "PIL")
_SERVER_DEPS = ("fastapi", "uvicorn", "pydantic")
_FRONTEND_DEPS = ("httpx",)


def _assert_importable(names: Iterable[str], group: str) -> None:
    missing = []
    for name in names:
        try:
            importlib.import_module(name)
        except Exception:  # pragma: no cover - import failure path
            missing.append(name)
    if missing:
        raise RuntimeNotReady(f"missing {group} dependencies: {', '.join(missing)}")


def assert_core_runtime_ready(require_tpu: bool = False) -> None:
    _assert_importable(_CORE_DEPS, "core")
    if require_tpu:
        import jax

        kinds = {d.platform for d in jax.devices()}
        if not kinds & {"tpu", "axon"}:
            raise RuntimeNotReady(f"TPU required but available platforms are {sorted(kinds)}")


def assert_server_runtime_ready() -> None:
    assert_core_runtime_ready()
    _assert_importable(_SERVER_DEPS, "server")


def assert_frontend_runtime_ready() -> None:
    _assert_importable(_FRONTEND_DEPS, "frontend")


_CACHE_ENABLED = False


def enable_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache: compiled executables survive process
    restarts, so a restarted server skips the multi-minute cold compile.
    This is the XLA analog of the reference's reserved TensorRT engine files
    (core/trt/build_engine.py).

    CPU backends are excluded: XLA:CPU AOT entries embed compile-time tuning
    features (e.g. ``+prefer-no-gather``) that the loader's host-feature
    check does not report, so ANY cross-process CPU cache load emits a
    "Compile machine features ... vs host machine features ... SIGILL"
    error — and a cache dir genuinely shared across heterogeneous hosts
    risks real SIGILLs. CPU is the test/dryrun backend here with
    fast-compiling tiny geometries; the cache's payoff (the multi-minute
    production compile) is TPU-only."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    path = path or os.environ.get(
        "VIDEO_CAPTION_COMPILE_CACHE", os.path.expanduser("~/.cache/video_caption_tpu/xla")
    )
    try:
        if jax.default_backend() == "cpu":
            _CACHE_ENABLED = True   # decided for this process; don't re-probe
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
    except Exception:  # pragma: no cover - older jax without the knob
        pass


def device_summary() -> dict:
    """Environment fingerprint for reports (reference: benchmark_baseline.py:319-327)."""
    import jax

    devs = jax.devices()
    return {
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "num_devices": len(devs),
        "device_kind": devs[0].device_kind if devs else "none",
    }
