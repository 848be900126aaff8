#!/usr/bin/env python
"""Pack per-video JPEG frames into one HDF5 archive (equivalent of reference
``src/pil2hdf5.py``): one group per video id, one uint8-bytes dataset per
frame index — the format ``stlt_tpu.data.appearance.AppearanceDataset``
consumes. Idempotent: already-present video groups are skipped.
"""

import argparse
import json
import os

import h5py
import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Packs JPEG frames as HDF5.")
    parser.add_argument("--videoid2size_path", type=str,
                        default="data/videoid2size.json",
                        help="Path to the videoid2size json file.")
    parser.add_argument("--pil_images_path", type=str,
                        default="data/PIL-20bn-something-something-v2",
                        help="From where to load the JPEG frames.")
    parser.add_argument("--save_hdf5_path", type=str, default="data/dataset.hdf5",
                        help="Where to save the HDF5 file.")
    args = parser.parse_args()

    with open(args.videoid2size_path) as f:
        video_ids = list(json.load(f))
    with h5py.File(args.save_hdf5_path, "a", libver="latest") as hf:
        for video_id in video_ids:
            if video_id in hf:
                continue  # idempotent resume
            video_dir = os.path.join(args.pil_images_path, video_id)
            grp = hf.create_group(video_id)
            for frame_name in os.listdir(video_dir):
                with open(os.path.join(video_dir, frame_name), "rb") as img:
                    data = np.frombuffer(img.read(), dtype=np.uint8)
                grp.create_dataset(frame_name.split(".")[0], data=data)


if __name__ == "__main__":
    main()
