#!/usr/bin/env python
"""Convert a released reference PyTorch checkpoint to a flax msgpack file.

The train/inference CLIs already convert ``.pt`` files on the fly; this tool
does it once offline (faster startup, drops the torch dependency from the
serving image):

    python tools/convert_checkpoint.py --model_name stlt \
        --dataset_name something --num_classes 174 \
        --checkpoint_path stlt_comp_detections.pt --output best.msgpack
"""

from __future__ import annotations

import argparse
import logging


def main():
    parser = argparse.ArgumentParser(description="torch .pt -> flax msgpack converter")
    parser.add_argument("--model_name", type=str, required=True,
                        help="stlt | resnet3d | resnet3d-transformer | lcf | caf | cacnf")
    parser.add_argument("--dataset_name", type=str, default="something")
    parser.add_argument("--num_classes", type=int, required=True)
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--hidden_size", type=int, default=768)
    parser.add_argument("--num_attention_heads", type=int, default=12)
    parser.add_argument("--num_spatial_layers", type=int, default=4)
    parser.add_argument("--num_temporal_layers", type=int, default=8)
    parser.add_argument("--num_appearance_layers", type=int, default=4)
    parser.add_argument("--num_fusion_layers", type=int, default=4)
    parser.add_argument("--appearance_num_frames", type=int, default=32)
    parser.add_argument("--layout_num_frames", type=int, default=16)
    parser.add_argument("--spatial_size", type=int, default=112)
    parser.add_argument("--with_scores", action="store_true",
                        help="Action Genome models take box scores.")
    parser.add_argument("--platform", type=str, default="cpu")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import category2id_for, make_model_config
    from stlt_tpu.models import models_factory
    from stlt_tpu.training.checkpoint import save_params
    from stlt_tpu.utils.convert import load_torch_state_dict, torch_to_flax_params

    logging.basicConfig(level=logging.INFO)
    config = make_model_config(
        args.model_name,
        num_classes=args.num_classes,
        unique_categories=len(category2id_for(args.dataset_name)),
        hidden_size=args.hidden_size,
        num_attention_heads=args.num_attention_heads,
        num_spatial_layers=args.num_spatial_layers,
        num_temporal_layers=args.num_temporal_layers,
        num_appearance_layers=args.num_appearance_layers,
        num_fusion_layers=args.num_fusion_layers,
        appearance_num_frames=args.appearance_num_frames,
        resnet_model_path="unused",
    )
    model = models_factory[args.model_name](config)

    # Template batch with the right structure for init.
    batch = _synthetic_layout_batch(
        2, args.layout_num_frames + 1, 8, len(category2id_for(args.dataset_name))
    )
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    if args.with_scores:
        inputs["scores"] = np.zeros_like(batch["categories"], dtype=np.float32)
    if args.model_name in ("resnet3d", "resnet3d-transformer", "lcf", "caf", "cacnf"):
        inputs["video_frames"] = np.zeros(
            (2, args.appearance_num_frames, args.spatial_size, args.spatial_size, 3),
            np.float32,
        )
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    state_dict = load_torch_state_dict(args.checkpoint_path)
    try:
        params = torch_to_flax_params(state_dict, params, strict=True)
    except KeyError as e:
        logging.warning("strict conversion failed (%s); retrying strict=False", e)
        params = torch_to_flax_params(state_dict, params, strict=False)
    save_params(args.output, params)
    logging.info("Wrote %s", args.output)


if __name__ == "__main__":
    main()
