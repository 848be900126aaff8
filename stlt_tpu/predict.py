"""Prediction CLI — the serving surface.

No reference counterpart (the reference only prints aggregate metrics); this
completes the production story: batch inference over a dataset JSON emitting
per-clip top-k predictions as JSON lines.

    python -m stlt_tpu.predict --dataset_name something --dataset_type layout \
        --model_name stlt --test_dataset_path val.json --labels_path labels.json \
        --videoid2size_path sizes.json --checkpoint_path best.msgpack \
        --output predictions.jsonl --top_k 5
"""

from __future__ import annotations

import json
import logging

import jax
import numpy as np

from stlt_tpu.configs import category2id_for, make_model_config, position_table_rows
from stlt_tpu.data import collaters_factory, datasets_factory
from stlt_tpu.data.loader import Loader
from stlt_tpu.models import models_factory
from stlt_tpu.parallel.mesh import make_mesh
from stlt_tpu.parser import build_parser
from stlt_tpu.train import (
    build_data_config,
    make_template_batch,
    model_inputs_template,
)
from stlt_tpu.training import checkpoint as ckpt
from stlt_tpu.training.loop import compile_steps


def predict(args):
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    from stlt_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)
    data_cfg = build_data_config(args, train=False, dataset_path=args.test_dataset_path)
    dataset = datasets_factory[args.dataset_type](data_cfg)
    loader = Loader(
        dataset,
        args.batch_size,
        collaters_factory[args.dataset_type](data_cfg),
        prefetch=max(args.num_workers, 2),
        workers=max(args.num_workers, 1),
    )
    num_classes = len(dataset.labels)
    id2label = {int(v): k for k, v in dataset.labels.items()}
    model_config = make_model_config(
        args.model_name,
        num_classes=num_classes,
        layout_num_frames=position_table_rows(data_cfg),
        unique_categories=len(category2id_for(args.dataset_name)),
        num_spatial_layers=args.num_spatial_layers,
        num_temporal_layers=args.num_temporal_layers,
        appearance_num_frames=args.appearance_num_frames,
        resnet_model_path=args.resnet_model_path,
        hidden_size=args.hidden_size,
        num_attention_heads=args.num_attention_heads,
        num_appearance_layers=args.num_appearance_layers,
        num_fusion_layers=args.num_fusion_layers,
        resnet_depth=args.resnet_depth,
        compute_dtype=args.compute_dtype,
        use_pallas=args.use_pallas,
        remat=args.remat,
    )
    model = models_factory[args.model_name](model_config)
    template_batch = make_template_batch(dataset, args.dataset_type, data_cfg)
    from stlt_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(None)  # init is eager; ring attention only under jit
    params = model.init(
        jax.random.PRNGKey(0), model_inputs_template(template_batch)
    )["params"]
    params = ckpt.load_params(args.checkpoint_path, params, strict=False)
    mesh = make_mesh(args.model_parallel, batch_size=args.batch_size,
                     context_parallel=args.context_parallel)
    steps = compile_steps(mesh, model, params_template=params,
                          batch_template=template_batch)
    params = jax.device_put(params, steps.params_sharding)

    head = model.logit_names[-1]  # ensemble for cacnf, the single head otherwise
    multilabel = args.dataset_name == "action_genome"
    # clip index → id (loader preserves dataset order when not shuffling)
    def clip_id(i):
        if hasattr(dataset, "json_file"):
            return dataset.json_file[i]["id"]
        if hasattr(dataset, "layout_dataset"):  # multimodal
            return dataset.layout_dataset.json_file[i]["id"]
        return getattr(dataset, "_video_ids")[i]  # native tokenizer

    from stlt_tpu.data.loader import device_prefetch

    rows = []
    index = 0
    for batch in device_prefetch(loader, steps.batch_sharding):
        logits = np.asarray(steps.eval_step(params, batch)[head], dtype=np.float64)
        size = int(np.asarray(batch["valid"]).sum())
        for row in range(size):
            scores = logits[row]
            if multilabel:
                probs = 1.0 / (1.0 + np.exp(-scores))
            else:
                exp = np.exp(scores - scores.max())
                probs = exp / exp.sum()
            top = np.argsort(-probs)[: args.top_k]
            rows.append(
                {
                    "video_id": clip_id(index + row),
                    "top_k": [
                        {
                            "label_id": int(c),
                            "label": id2label.get(int(c), str(int(c))),
                            "score": float(probs[c]),
                        }
                        for c in top
                    ],
                }
            )
        index += size
    out_path = args.output or "predictions.jsonl"
    with open(out_path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    logging.info("Wrote %d predictions to %s", len(rows), out_path)
    return rows


def main():
    parser = build_parser("Per-clip top-k predictions with a trained model.")
    parser.add_argument("--top_k", type=int, default=5)
    parser.add_argument("--output", type=str, default="predictions.jsonl")
    predict(parser.parse_args())


if __name__ == "__main__":
    main()
