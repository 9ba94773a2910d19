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


def _host_cpu_fingerprint() -> str:
    """Short digest of the host CPU's ISA features. XLA:CPU AOT-compiled
    executables embed machine features (AVX512 etc.); a persistent cache
    shared across heterogeneous hosts can hand a binary to a host that lacks
    its features ("Compile machine features ... vs host machine features ...
    SIGILL" warnings). Keying the cache dir by this digest makes each host
    family its own cache."""
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # pragma: no cover - non-Linux host
        feats += " " + platform.processor()
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache: compiled executables survive process
    restarts, so a restarted server skips the multi-minute cold compile.
    This is the XLA analog of the reference's reserved TensorRT engine files
    (core/trt/build_engine.py).

    CPU-backend executables are keyed by host CPU features (the TPU cache is
    shared — device kind is already part of XLA's own cache key)."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    path = path or os.environ.get(
        "VIDEO_CAPTION_COMPILE_CACHE", os.path.expanduser("~/.cache/video_caption_tpu/xla")
    )
    try:
        if jax.default_backend() == "cpu":
            path = os.path.join(path, f"cpu-{_host_cpu_fingerprint()}")
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
