"""Synthetic dataset fixtures matching the L0 JSON schemas (SURVEY.md §2.5)."""

import json
import os

import numpy as np


def make_something_fixture(
    tmpdir, num_videos=6, num_frames_range=(4, 30), seed=0, constant_frames=False
):
    """Write a tiny Something-Else-style layout dataset + labels + sizes.

    With ``constant_frames=True`` every frame of a video repeats the same
    objects, so the label signal survives stochastic frame re-sampling —
    needed for overfitting tests.
    """
    rng = np.random.default_rng(seed)
    templates = [f"Doing thing {i}" for i in range(4)]
    labels = {t: str(i) for i, t in enumerate(templates)}
    videos, videoid2size = [], {}
    for v in range(num_videos):
        vid = str(10000 + v)
        width, height = int(rng.integers(200, 480)), int(rng.integers(150, 360))
        videoid2size[vid] = [width, height]

        def random_objects():
            objs = []
            for _o in range(int(rng.integers(0 if not constant_frames else 1, 4))):
                x1, y1 = rng.uniform(0, width - 2), rng.uniform(0, height - 2)
                objs.append(
                    {
                        "category": "hand" if rng.random() < 0.4 else "object",
                        "x1": float(x1),
                        "y1": float(y1),
                        "x2": float(x1 + rng.uniform(1, width - x1)),
                        "y2": float(y1 + rng.uniform(1, height - y1)),
                        "score": float(rng.uniform(0.2, 1.0)),
                    }
                )
            return objs

        num_frames = int(rng.integers(*num_frames_range))
        if constant_frames:
            shared = random_objects()
            frames = [{"frame_objects": shared} for _ in range(num_frames)]
        else:
            frames = [{"frame_objects": random_objects()} for _ in range(num_frames)]
        videos.append(
            {
                "id": vid,
                "template": f"[{templates[v % len(templates)]}]"
                if v % 2
                else templates[v % len(templates)],
                "frames": frames,
            }
        )
    paths = {
        "dataset_path": os.path.join(tmpdir, "dataset.json"),
        "labels_path": os.path.join(tmpdir, "labels.json"),
        "videoid2size_path": os.path.join(tmpdir, "videoid2size.json"),
    }
    json.dump(videos, open(paths["dataset_path"], "w"))
    json.dump(labels, open(paths["labels_path"], "w"))
    json.dump(videoid2size, open(paths["videoid2size_path"], "w"))
    return paths, videos, labels, videoid2size


def make_video_hdf5(tmpdir, videoid2size, num_frames=12, seed=0,
                    filename="videos.h5", full_size=False):
    """Write an HDF5 JPEG-frame archive matching the reference pil2hdf5.py
    format: one group per video id, one uint8-bytes dataset per frame index.

    ``full_size=True`` writes frames at the declared video size (realistic
    JPEG decode cost — used by throughput benchmarks); default quarter-size
    frames keep test fixtures fast (the decoding path is identical)."""
    import io

    import h5py
    from PIL import Image

    rng = np.random.default_rng(seed)
    path = os.path.join(tmpdir, filename)
    with h5py.File(path, "w", libver="latest") as f:
        for vid, (w, h) in videoid2size.items():
            grp = f.create_group(vid)
            fh, fw = (
                (h, w) if full_size
                else (max(h // 4, 40), max(w // 4, 40))
            )
            for i in range(num_frames):
                img = Image.fromarray(
                    rng.integers(0, 255, (fh, fw, 3), dtype=np.uint8),
                    "RGB",
                )
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = np.frombuffer(buf.getvalue(), dtype=np.uint8)
                grp.create_dataset(str(i), data=data)
    return path


def make_action_genome_fixture(tmpdir, num_videos=4, seed=1):
    """Action-Genome-style: multi-label actions, object categories, scores kept."""
    rng = np.random.default_rng(seed)
    # every class gets at least one positive (Charades mAP is NaN otherwise —
    # the reference's behavior too, evaluation.py:109-110)
    num_actions = 2 * num_videos
    labels = {f"c{i:03d}": str(i) for i in range(num_actions)}
    categories = ["person", "chair", "book", "table", "floor"]
    videos, videoid2size = [], {}
    for v in range(num_videos):
        vid = f"AG{v:04d}"
        width, height = 480, 270
        videoid2size[vid] = [width, height]
        frames = []
        for _ in range(int(rng.integers(3, 12))):
            objs = []
            for _o in range(int(rng.integers(1, 4))):
                x1, y1 = rng.uniform(0, width - 2), rng.uniform(0, height - 2)
                objs.append(
                    {
                        "category": str(rng.choice(categories)),
                        "x1": float(x1),
                        "y1": float(y1),
                        "x2": float(x1 + rng.uniform(1, width - x1)),
                        "y2": float(y1 + rng.uniform(1, height - y1)),
                        "score": float(rng.uniform(0.3, 1.0)),
                    }
                )
            frames.append({"frame_objects": objs})
        actions = [f"c{2 * v:03d}", f"c{2 * v + 1:03d}"]
        videos.append({"id": vid, "actions": actions, "frames": frames})
    paths = {
        "dataset_path": os.path.join(tmpdir, "ag_dataset.json"),
        "labels_path": os.path.join(tmpdir, "ag_labels.json"),
        "videoid2size_path": os.path.join(tmpdir, "ag_videoid2size.json"),
    }
    json.dump(videos, open(paths["dataset_path"], "w"))
    json.dump(labels, open(paths["labels_path"], "w"))
    json.dump(videoid2size, open(paths["videoid2size_path"], "w"))
    return paths, videos, labels, videoid2size
