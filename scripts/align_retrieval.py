"""Standalone align-train + retrieval-eval leg of the quality loop.

Runs train_align (InfoNCE, fp32/GAP — quality_loop.train_align docstring)
on the synthetic captioning dataset and evaluates text->video retrieval
Recall@K/MRR for the trained vs random encoder, writing
reports/quality_loop/retrieval.csv. On TPU the full size runs in minutes;
pass smaller sizes for CPU smoke runs.

Usage: python scripts/align_retrieval.py [--image_size 224] [--num_frames 8]
       [--steps 300] [--unique_captions]
"""
import argparse
import json
import logging
from pathlib import Path

from video_caption_tpu.tools.quality_loop import (
    eval_align_retrieval, make_synthetic_dataset, train_align)

log = logging.getLogger(__name__)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, force=True)
    logging.getLogger(
        "video_caption_tpu.preprocessing.frame_loader").setLevel(logging.WARNING)
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/quality_loop_data_align")
    p.add_argument("--out", default="reports/quality_loop/retrieval.csv")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--unique_captions", action="store_true",
                   help="one train record per caption (duplicate captions "
                        "are false negatives for the in-batch InfoNCE)")
    args = p.parse_args(argv)

    anns = make_synthetic_dataset(
        args.root, num_frames=args.num_frames, image_size=args.image_size)
    train_path = anns["train"]
    if args.unique_captions:
        recs, seen = [], set()
        for r in json.loads(Path(train_path).read_text()):
            c = r["captions"][0]
            if c not in seen:
                seen.add(c)
                recs.append(r)
        train_path = str(Path(args.root) / "train_unique.json")
        Path(train_path).write_text(json.dumps(recs))
        log.info("unique-caption train set: %d records", len(recs))

    cfg, trained, random_p, tok = train_align(
        train_path, args.num_frames, args.image_size, max_steps=args.steps)
    rt = eval_align_retrieval(
        cfg, trained, anns["val"], args.num_frames, args.image_size, tok)
    rr = eval_align_retrieval(
        cfg, random_p, anns["val"], args.num_frames, args.image_size, tok)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w") as fh:
        fh.write("model,recall@1,recall@5,mrr,num_queries\n")
        for name, m in (("trained", rt), ("random", rr)):
            fh.write(f"{name},{m['recall@1']:.4f},{m['recall@5']:.4f},"
                     f"{m['mrr']:.4f},{m['num_queries']}\n")
    import jax

    print(json.dumps({
        "trained": rt, "random": rr,
        "device": str(getattr(jax.devices()[0], "device_kind", "cpu")),
        "steps": args.steps, "image_size": args.image_size,
        "num_frames": args.num_frames}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
