#!/usr/bin/env python
"""Build Action Genome / Charades layout datasets.

Equivalent of the reference ``src/create_action_genome_datasets.py``: reads
``object_bbox_and_relationship.pkl`` (xywh → xyxy) and ``person_bbox.pkl``
(adds the person box with its detector score), keeps visible objects only,
joins the Charades train/test CSVs for multi-label actions, drops empty
frames, and writes full/train/val JSONs.
"""

import argparse
import csv
import json
import os
import pickle
import re


def natural_key(name: str):
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", name)]


def collect_video_frames(action_genome_path: str) -> dict:
    with open(os.path.join(action_genome_path, "object_bbox_and_relationship.pkl"), "rb") as f:
        object_anno = pickle.load(f)
    with open(os.path.join(action_genome_path, "person_bbox.pkl"), "rb") as f:
        person_anno = pickle.load(f)

    videoid2frames = {}
    for frame_name in sorted(object_anno.keys(), key=natural_key):
        dir_part, file_part = os.path.split(frame_name)
        video_id, frame_id = dir_part.split(".")[0], file_part.split(".")[0]
        objects = []
        for obj in object_anno[frame_name]:
            if not obj["visible"]:
                continue
            x1, y1 = obj["bbox"][:2]
            objects.append(
                {
                    "category": obj["class"],
                    "x1": x1,
                    "y1": y1,
                    "x2": x1 + obj["bbox"][2],  # xywh → xyxy
                    "y2": y1 + obj["bbox"][3],
                    "score": 1.0,
                }
            )
        person = person_anno[frame_name]
        if person["bbox"].shape == (1, 4):
            x1, y1, x2, y2 = (float(v) for v in person["bbox"][0])
            objects.append(
                {
                    "category": "person",
                    "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                    "score": float(person["bbox_score"].item()),
                }
            )
        videoid2frames.setdefault(video_id, []).append(
            {"frame_id": frame_id, "frame_objects": objects}
        )
    return videoid2frames


def read_charades_actions(csv_path: str):
    actions, ids = {}, set()
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            parts = [a.split()[0] for a in row["actions"].split(";") if a.split()]
            if not parts:
                continue
            actions[row["id"]] = parts
            ids.add(row["id"])
    return actions, ids


def main():
    parser = argparse.ArgumentParser(
        description="Creates a dataset from Action Genome and Charades."
    )
    parser.add_argument("--action_genome_path", type=str,
                        default="data/action_genome_v1.0",
                        help="Path to the action genome directory.")
    parser.add_argument("--charades_path", type=str, default="data/Charades",
                        help="Path to the Charades directory.")
    parser.add_argument("--save_datasets_path", type=str, default="data/action_genome/",
                        help="Where to save the datasets.")
    args = parser.parse_args()

    videoid2frames = collect_video_frames(args.action_genome_path)
    train_actions, train_ids = read_charades_actions(
        os.path.join(args.charades_path, "Charades_v1_train.csv")
    )
    val_actions, val_ids = read_charades_actions(
        os.path.join(args.charades_path, "Charades_v1_test.csv")
    )
    videoid2actions = {**train_actions, **val_actions}

    print("Packing and dumping datasets...")
    full, train, val = [], [], []
    for video_id, frames in videoid2frames.items():
        entry = {
            "id": video_id,
            "frames": [f for f in frames if f["frame_objects"]],  # drop empty
            "actions": videoid2actions[video_id],
        }
        full.append(entry)
        if video_id in train_ids:
            train.append(entry)
        elif video_id in val_ids:
            val.append(entry)
    for name, ds in (("full", full), ("train", train), ("val", val)):
        with open(os.path.join(args.save_datasets_path, f"{name}_dataset.json"), "w") as f:
            json.dump(ds, f)
        print(f"{name}: {len(ds)} videos")


if __name__ == "__main__":
    main()
