"""Inference CLI.

Reference: ``src/inference.py:16-94``. Same flow: test dataset/loader, model
construction from flags, checkpoint load with a strict→non-strict fallback
(for the score-embeddings mismatch, inference.py:59-69), eval loop, metrics
printed ×100 rounded to 2 decimals. Accepts both this framework's msgpack
checkpoints and the reference's released torch ``.pt`` files (converted
on the fly).

    python -m stlt_tpu.inference --dataset_name something --dataset_type layout \
        --model_name stlt --test_dataset_path ... --labels_path ... \
        --videoid2size_path ... --checkpoint_path stlt.pt
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from stlt_tpu.configs import (
    category2id_for,
    frame_capacity_for,
    make_model_config,
    position_table_rows,
    spatial_live_capacity_for,
)
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
from stlt_tpu.training.evaluation import evaluators_factory
from stlt_tpu.training.loop import (
    EvalCountAccumulator,
    EvalProbsAccumulator,
    compile_steps,
)


def inference(args):
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    from stlt_tpu.parallel.distributed import maybe_initialize, process_row_span
    from stlt_tpu.parallel.mesh import batch_sharding as data_sharding

    multiprocess = maybe_initialize(args)
    from stlt_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)
    logging.info("Devices: %s", jax.devices())
    mesh = make_mesh(args.model_parallel, batch_size=args.batch_size,
                     context_parallel=args.context_parallel)
    rows = (
        process_row_span(data_sharding(mesh), args.batch_size)
        if multiprocess
        else None
    )
    logging.info("Preparing dataset...")
    data_cfg = build_data_config(args, train=False, dataset_path=args.test_dataset_path)
    test_dataset = datasets_factory[args.dataset_type](data_cfg)
    logging.info("Inference on %d", len(test_dataset))
    loader = Loader(
        test_dataset,
        args.batch_size,
        collaters_factory[args.dataset_type](data_cfg),
        prefetch=max(args.num_workers, 2),
        workers=max(args.num_workers, 1),
        rows=rows,
    )
    num_classes = len(test_dataset.labels)
    # --live_prefix ragged levers (see train._live_prefix_caps): frame-axis
    # truncation + spatial live-prefix, both dataset-bounded; neither under
    # a context-sharded mesh (the ring shards the frame axis).
    live_cap = frame_cap = None
    if (getattr(args, "live_prefix", False) and args.use_pallas
            and getattr(args, "context_parallel", 1) <= 1):
        frame_cap = frame_capacity_for(test_dataset, data_cfg)
        live_cap = spatial_live_capacity_for(
            test_dataset, data_cfg, args.batch_size, frame_axis=frame_cap
        )
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
        hidden_dropout_prob=args.hidden_dropout_prob,
        num_attention_heads=args.num_attention_heads,
        num_appearance_layers=args.num_appearance_layers,
        num_fusion_layers=args.num_fusion_layers,
        resnet_depth=args.resnet_depth,
        compute_dtype=args.compute_dtype,
        use_pallas=args.use_pallas,
        remat=args.remat,
        spatial_live_capacity=live_cap,
        temporal_frame_capacity=frame_cap,
    )
    logging.info("==================================")
    logging.info("The model's configuration is:\n%s", model_config)
    logging.info("==================================")
    model = models_factory[args.model_name](model_config)

    template_batch = make_template_batch(test_dataset, args.dataset_type, data_cfg)
    from stlt_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(None)  # init is eager; ring attention only under jit
    params = model.init(
        jax.random.PRNGKey(0), model_inputs_template(template_batch)
    )["params"]
    try:
        params = ckpt.load_params(args.checkpoint_path, params, strict=True)
    except (KeyError, ValueError) as e:
        logging.warning(
            "Default loading failed, loading with strict=False. If it's only "
            "score_embedding modules it's ok. Otherwise see exception below"
        )
        logging.warning("%s", e)
        params = ckpt.load_params(args.checkpoint_path, params, strict=False)

    steps = compile_steps(mesh, model, params_template=params,
                          batch_template=template_batch)
    from stlt_tpu.data.loader import device_prefetch
    from stlt_tpu.parallel.distributed import put_tree

    params = put_tree(params, steps.params_sharding)

    evaluator = evaluators_factory[args.dataset_name](
        len(test_dataset), num_classes, model.logit_names
    )
    logging.info("Starting inference...")
    count_path = hasattr(evaluator, "process_counts")
    probs_path = not count_path and hasattr(evaluator, "process_probs")
    count_acc = EvalCountAccumulator()
    probs_acc = EvalProbsAccumulator()
    for batch in device_prefetch(
        loader, steps.batch_sharding, global_batch_size=args.batch_size
    ):
        if count_path:
            count_acc.add(steps.eval_counts_step(params, batch))
        elif probs_path:
            probs_acc.add(steps.eval_probs_step(params, batch))
        else:
            logits = steps.eval_step(params, batch)
            evaluator.process(
                {k: np.asarray(v) for k, v in logits.items()},
                steps.to_host(batch["labels"]),
                valid=steps.to_host(batch["valid"]),
            )
    count_acc.flush_into(evaluator)
    probs_acc.flush_into(evaluator)
    metrics = evaluator.evaluate()
    logging.info("=================================")
    logging.info("The metrics are:")
    for m, v in metrics.items():
        logging.info("%s: %s", m, round(v * 100, 2))
    logging.info("=================================")
    return metrics


def main():
    parser = build_parser("Inference with a model, currently STLT, LCF, CAF, and CACNF.")
    inference(parser.parse_args())


if __name__ == "__main__":
    main()
