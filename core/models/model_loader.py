"""Legacy shim (reference: core/models/model_loader.py): checkpoint load +
convert live in models/convert.py here."""
from video_caption_tpu.models.convert import (  # noqa: F401
    load_torch_checkpoint, convert_caption_checkpoint, merge_params,
    remap_legacy_keys,
)
