"""Runtime utilities (canonical homes: env.py, memory.py, config.py —
re-exported here to match the models/ops/parallel/utils package layout)."""

from video_caption_tpu.config import (  # noqa: F401
    CompileConfig,
    InferenceConfig,
    MemoryConfig,
    MeshConfig,
    default_inference_config,
)
from video_caption_tpu.env import (  # noqa: F401
    RuntimeNotReady,
    assert_core_runtime_ready,
    assert_frontend_runtime_ready,
    assert_server_runtime_ready,
    device_summary,
    enable_compilation_cache,
)
from video_caption_tpu.memory import DeviceMemorySnapshot, MemoryManager, is_oom_error  # noqa: F401
