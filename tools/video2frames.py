#!/usr/bin/env python
"""Decode .webm videos to per-frame JPEGs (equivalent of reference
``src/video2pil.py``).

Decodes with the ffmpeg binary via subprocess (no ffmpeg-python dependency),
fans out across worker threads, and is idempotent (skips videos whose output
directory already exists — same resume behavior as the reference).
"""

import argparse
import json
import math
import os
import shutil
import subprocess
import threading
from typing import List

import numpy as np
from PIL import Image


def probe_size(path: str):
    out = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0",
         "-show_entries", "stream=width,height", "-of", "csv=p=0", path],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    width, height = (int(v) for v in out.split(","))
    return width, height


def decode_video(path: str) -> np.ndarray:
    width, height = probe_size(path)
    raw = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-f", "rawvideo",
         "-pix_fmt", "rgb24", "pipe:"],
        capture_output=True, check=True,
    ).stdout
    return np.frombuffer(raw, np.uint8).reshape(-1, height, width, 3)


def convert_chunk(video_ids: List[str], load_dir: str, save_dir: str):
    for video_id in video_ids:
        src = os.path.join(load_dir, f"{video_id}.webm")
        dst = os.path.join(save_dir, video_id)
        if os.path.exists(dst):
            continue  # idempotent resume
        os.makedirs(dst)
        try:
            for i, frame in enumerate(decode_video(src)):
                Image.fromarray(frame).save(os.path.join(dst, f"{i}.jpg"))
        except Exception:
            shutil.rmtree(dst, ignore_errors=True)  # no partial outputs
            raise


def main():
    parser = argparse.ArgumentParser(description="Saves all videos as JPEG frames.")
    parser.add_argument("--videoid2size_path", type=str,
                        default="data/videoid2size.json",
                        help="Path to the videoid2size json file.")
    parser.add_argument("--load_videos_path", type=str,
                        default="data/20bn-something-something-v2",
                        help="Path to the webm videos.")
    parser.add_argument("--save_videos_path", type=str,
                        default="data/PIL-20bn-something-something-v2",
                        help="Where to write the frame directories.")
    parser.add_argument("--num_threads", type=int, default=5,
                        help="How many threads to start.")
    args = parser.parse_args()

    if shutil.which("ffmpeg") is None:
        raise SystemExit("ffmpeg binary not found on PATH — install it first")
    if not os.path.exists(args.save_videos_path):
        raise ValueError(f"{args.save_videos_path} has to exist!")
    with open(args.videoid2size_path) as f:
        video_ids = list(json.load(f))
    chunk = math.ceil(len(video_ids) / args.num_threads)
    threads = [
        threading.Thread(
            target=convert_chunk,
            args=(video_ids[i : i + chunk], args.load_videos_path, args.save_videos_path),
        )
        for i in range(0, len(video_ids), chunk)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


if __name__ == "__main__":
    main()
