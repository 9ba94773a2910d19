"""Export a checkpoint to the reference's torch format.

    python -m video_caption_tpu.tools.export_checkpoint \
        --ckpt runs/mapper/best  --out exported.pt

Accepts either an orbax directory (this package's native format) or a torch
.pt (re-exported after conversion — useful to normalize legacy ``vit.*``
key spaces). The output loads in the reference stack via
``VideoCaptionModel.load_state_dict`` (model_loader.py) AND back here.
"""
from __future__ import annotations

import argparse
import logging


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser("Export checkpoint to reference torch format")
    p.add_argument("--ckpt", required=True, help="orbax dir or torch .pt")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--num_frames", type=int, default=8)
    args = p.parse_args(argv)

    from video_caption_tpu.config import default_inference_config
    from video_caption_tpu.engine import load_params, model_config_from_inference
    from video_caption_tpu.models.convert import save_torch_checkpoint

    config = default_inference_config(ckpt=args.ckpt, num_frames=args.num_frames)
    model_cfg = model_config_from_inference(config)
    params = load_params(config, model_cfg)
    if args.ckpt.endswith((".pt", ".pth", ".bin")):
        # torch input: the payload itself carries the training metadata
        # (train_caption_mapper.py:301-305) — preserve it through re-export
        import torch

        try:
            raw = torch.load(args.ckpt, map_location="cpu", weights_only=True)
        except Exception:
            raw = {}
        meta = {k: raw[k] for k in ("step", "epoch", "best_val", "args")
                if isinstance(raw, dict) and k in raw}
    else:
        from video_caption_tpu.training.checkpoint import load_metadata

        meta = load_metadata(args.ckpt)
    save_torch_checkpoint(
        args.out, params, model_cfg,
        step=meta.get("step", 0), epoch=meta.get("epoch", 0),
        best_val=meta.get("best_val", float("inf")), args=meta.get("args"),
    )
    print(f"exported {args.ckpt} -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
