#!/usr/bin/env python
"""Dump per-clip appearance features to HDF5.

Working equivalent of the reference's feature-dump utilities
(``src/dump_perframe_features.py`` crashes on a wrong import and
``src/dump_perbox_features.py`` iterates a stale schema — both unused by the
main path, SURVEY.md §2.5). This tool runs the frozen-BN R3D backbone over
the HDF5 JPEG archive and writes, per video id:

- ``features``: ``[T', 2048]`` float32 — spatially-pooled per-temporal-unit
  features (the per-frame analogue), and
- ``pooled``: ``[2048]`` float32 — the global average (the per-clip feature).

Resumable: already-written video ids are skipped (the reference scripts'
idempotence semantics, SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Dumps R3D appearance features to HDF5.")
    parser.add_argument("--dataset_path", type=str, required=True,
                        help="Layout/metadata JSON listing video ids.")
    parser.add_argument("--labels_path", type=str, required=True)
    parser.add_argument("--videoid2size_path", type=str, required=True)
    parser.add_argument("--videos_path", type=str, required=True,
                        help="HDF5 JPEG-frame archive.")
    parser.add_argument("--resnet_model_path", type=str, default=None,
                        help="Kinetics R3D checkpoint (.pth); random init if omitted.")
    parser.add_argument("--save_features_path", type=str, required=True)
    parser.add_argument("--appearance_num_frames", type=int, default=32)
    parser.add_argument("--spatial_size", type=int, default=112)
    parser.add_argument("--resnet_depth", type=int, default=50)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import h5py

    from stlt_tpu.configs import AppearanceModelConfig, DataConfig
    from stlt_tpu.data.appearance import AppearanceDataset, collate_appearance
    from stlt_tpu.data.loader import Loader
    from stlt_tpu.models.appearance import Resnet3D

    logging.basicConfig(level=logging.INFO)
    data_cfg = DataConfig(
        dataset_name="something",
        dataset_path=args.dataset_path,
        labels_path=args.labels_path,
        videoid2size_path=args.videoid2size_path,
        videos_path=args.videos_path,
        train=False,
        appearance_num_frames=args.appearance_num_frames,
        spatial_size=args.spatial_size,
    )
    dataset = AppearanceDataset(data_cfg)
    model_cfg = AppearanceModelConfig(
        num_classes=1,  # classifier unused; features only
        appearance_num_frames=args.appearance_num_frames,
        resnet_model_path=args.resnet_model_path or "unused",
        resnet_depth=args.resnet_depth,
        compute_dtype="bfloat16",
    )
    model = Resnet3D(model_cfg)

    sample = dataset[0]
    template = {"video_frames": sample["video_frames"][None]}
    params = model.init(
        jax.random.PRNGKey(0), template, method=Resnet3D.forward_features
    )["params"]
    if args.resnet_model_path:
        from stlt_tpu.utils.convert import load_kinetics_r3d

        params = load_kinetics_r3d(params, args.resnet_model_path)
        logging.info("Loaded R3D weights from %s", args.resnet_model_path)

    @jax.jit
    def extract(params, batch):
        feats = model.apply(
            {"params": params}, batch, method=Resnet3D.forward_features
        )  # [B, T', H', W', C]
        per_frame = feats.mean(axis=(2, 3)).astype(np.float32)  # [B, T', C]
        return per_frame

    loader = Loader(dataset, args.batch_size, collate_appearance, prefetch=2)
    video_ids = [dataset.json_file[i]["id"] for i in range(len(dataset))]
    written = 0
    with h5py.File(args.save_features_path, "a", libver="latest") as out:
        index = 0
        for batch in loader:
            size = int(batch["valid"].sum())
            feats = np.asarray(extract(params, {"video_frames": batch["video_frames"]}))
            for row in range(size):
                vid = video_ids[index + row]
                if vid in out:
                    continue  # idempotent resume
                grp = out.create_group(vid)
                grp.create_dataset("features", data=feats[row])
                grp.create_dataset("pooled", data=feats[row].mean(axis=0))
                written += 1
            index += size
    logging.info("Wrote features for %d videos to %s", written, args.save_features_path)


if __name__ == "__main__":
    main()
