#!/usr/bin/env python
"""Build Something-Something / Something-Else layout datasets.

Equivalent of the reference ``src/create_something_datasets.py``: joins the
official split JSONs with the Something-Else per-chunk annotation JSONs,
collapsing categories to ``hand``/``object`` with score 1.0, and emits
``{id, template, frames: [{frame_objects: [{category,x1,y1,x2,y2,score}]}]}``
train/val JSONs — the L1 input schema (SURVEY.md §2.5).

Improvements over the reference: annotations are merged into ONE id→frames
index up front (the reference re-scans every chunk per video, O(V·C)), and
natural sorting is implemented inline instead of requiring natsort.
"""

import argparse
import json
import os
import re


def natural_key(name: str):
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", name)]


def load_annotation_index(annotations_path: str) -> dict:
    index = {}
    for name in sorted(os.listdir(annotations_path), key=natural_key):
        with open(os.path.join(annotations_path, name)) as f:
            index.update(json.load(f))
    return index


def prepare_dataset(dataset, annotation_index):
    prepared = []
    for entry in dataset:
        frames_src = annotation_index.get(entry["id"])
        if frames_src is None:
            continue
        frames = [
            {
                "frame_objects": [
                    {
                        "category": "hand" if "hand" in box["category"] else "object",
                        "x1": box["box2d"]["x1"],
                        "y1": box["box2d"]["y1"],
                        "x2": box["box2d"]["x2"],
                        "y2": box["box2d"]["y2"],
                        "score": 1.0,
                    }
                    for box in frame["labels"]
                ]
            }
            for frame in frames_src
        ]
        prepared.append({"id": entry["id"], "template": entry["template"], "frames": frames})
    return prepared


def main():
    parser = argparse.ArgumentParser(
        description="Creates a dataset for Something-Something and Something-Else."
    )
    parser.add_argument("--train_data_path", type=str, required=True,
                        help="Path to the default training dataset.")
    parser.add_argument("--val_data_path", type=str, required=True,
                        help="Path to the default validation dataset.")
    parser.add_argument("--annotations_path", type=str, required=True,
                        help="From where to load annotations.")
    parser.add_argument("--save_data_path", type=str, default="data/",
                        help="Where to save the datasets.")
    args = parser.parse_args()

    print("Loading annotations...")
    index = load_annotation_index(args.annotations_path)
    for split, path in (("train", args.train_data_path), ("val", args.val_data_path)):
        with open(path) as f:
            dataset = json.load(f)
        prepared = prepare_dataset(dataset, index)
        out = os.path.join(args.save_data_path, f"{split}_dataset.json")
        print(f"Dumping {split} dataset of size {len(prepared)} at: {out}")
        with open(out, "w") as f:
            json.dump(prepared, f)


if __name__ == "__main__":
    main()
