"""MSVD dataset preparation (reference: scripts/prepare_msvd.py,
msvd_prepare.py): turns either (a) a directory of videos + an
``annotations.txt`` of "video_id caption" lines (Kaggle layout), or (b) an
already-extracted frames tree, into the canonical layout:

    <out>/<split>/frames/<video_id>/frame_%05d.jpg
    <out>/<split>/annotations.json   # [{video_id, split, captions[],
                                     #   num_frames, fps, frames_dir}]

Decoding uses cv2 (the reference prefers decord/PyAV — unavailable here);
sampling is uniform center-of-bin (prepare_msvd.py:106-112), frames are
resized to 224 BICUBIC and saved JPEG q95 (:115-124).
"""
from __future__ import annotations

import argparse
import json
import logging
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional

log = logging.getLogger(__name__)


def parse_annotations_txt(path: str) -> Dict[str, List[str]]:
    """'video_id caption...' lines -> {video_id: [captions]} (msvd_prepare.py)."""
    grouped: Dict[str, List[str]] = defaultdict(list)
    for line in Path(path).read_text(encoding="utf-8", errors="replace").splitlines():
        line = line.strip()
        if not line:
            continue
        vid, _, caption = line.partition(" ")
        if caption:
            grouped[vid].append(caption.strip())
    return dict(grouped)


def uniform_bin_indices(total: int, num: int) -> List[int]:
    """Center-of-bin sampling (prepare_msvd.py:106-112)."""
    if total <= 0:
        return []
    num = min(num, total)
    return [int((i + 0.5) * total / num) for i in range(num)]


def extract_video_frames(
    video_path: str, out_dir: Path, num_frames: int = 32,
    image_size: int = 224, quality: int = 95,
) -> int:
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    picks = set(uniform_bin_indices(total, num_frames))
    out_dir.mkdir(parents=True, exist_ok=True)
    saved = idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx in picks:
            saved += 1
            resized = cv2.resize(frame, (image_size, image_size), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(out_dir / f"frame_{saved:05d}.jpg"), resized,
                        [cv2.IMWRITE_JPEG_QUALITY, quality])
        idx += 1
    cap.release()
    return saved


def default_split(video_ids: List[str]) -> Dict[str, str]:
    """Deterministic MSVD-style split: train 1576 / val 197 / test 197
    proportions (experiments/exp_log.md:14-16)."""
    ordered = sorted(video_ids)
    n = len(ordered)
    n_train = int(n * 1576 / 1970) if n >= 10 else max(n - 2, 1)
    n_val = int(n * 197 / 1970) if n >= 10 else max((n - n_train) // 2, 0)
    split = {}
    for i, vid in enumerate(ordered):
        split[vid] = "train" if i < n_train else ("val" if i < n_train + n_val else "test")
    return split


def prepare(
    videos_dir: str, annotations_txt: str, out_root: str,
    num_frames: int = 32, image_size: int = 224, limit: int = 0,
    splits: Optional[Dict[str, str]] = None,
) -> Dict[str, int]:
    captions = parse_annotations_txt(annotations_txt)
    videos = {
        p.stem: p for p in Path(videos_dir).iterdir()
        if p.suffix.lower() in {".avi", ".mp4", ".mkv", ".webm", ".mov"}
    }
    vids = [v for v in captions if v in videos]
    if limit:
        vids = vids[:limit]
    splits = splits or default_split(vids)

    records_by_split: Dict[str, List[Dict]] = defaultdict(list)
    for vid in vids:
        split = splits.get(vid, "train")
        frames_dir = Path(out_root) / split / "frames" / vid
        n = extract_video_frames(str(videos[vid]), frames_dir, num_frames, image_size)
        records_by_split[split].append({
            "video_id": vid, "split": split, "captions": captions[vid],
            "num_frames": n, "fps": 0, "frames_dir": str(frames_dir),
        })
        log.info("%s: %d frames, %d captions", vid, n, len(captions[vid]))

    counts = {}
    for split, records in records_by_split.items():
        ann = Path(out_root) / split / "annotations.json"
        ann.parent.mkdir(parents=True, exist_ok=True)
        ann.write_text(json.dumps(records, indent=1))
        counts[split] = len(records)
    log.info("split sizes: %s", counts)
    return counts


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser()
    p.add_argument("--videos_dir", required=True)
    p.add_argument("--annotations_txt", required=True)
    p.add_argument("--out_root", default="data/processed/msvd")
    p.add_argument("--num_frames", type=int, default=32)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)
    prepare(args.videos_dir, args.annotations_txt, args.out_root,
            args.num_frames, args.image_size, args.limit)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
