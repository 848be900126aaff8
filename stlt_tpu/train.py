"""Training CLI.

Reference: ``src/train.py:23-163``. Same end-to-end flow — logging (refusing
to overwrite an existing log file), dataset/loader construction, model config
from ``num_classes = len(val_dataset.labels)``, criterion, AdamW with
two-group weight decay, per-step linear warmup→decay over
``epochs × (len(train) // batch_size)`` steps, per-epoch eval, and
best-checkpoint export (optionally the backbone separately).

TPU-native differences: the whole step is one donated, mesh-sharded jit
(``stlt_tpu.training.loop``); batches have static shapes; optional Orbax step
checkpoints + resume via ``--resume_dir``; optional profiler traces.

Run it exactly like the reference:

    python -m stlt_tpu.train --dataset_name something --dataset_type layout \
        --model_name stlt --train_dataset_path ... --val_dataset_path ... \
        --labels_path ... --videoid2size_path ...
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from stlt_tpu.configs import (
    DataConfig,
    category2id_for,
    frame_capacity_for,
    make_model_config,
    position_table_rows,
    spatial_live_capacity_for,
)


def _live_prefix_caps(args, *dataset_cfgs):
    """--live_prefix: (spatial_live_capacity, temporal_frame_capacity) that
    are safe for every dataset the model sees (train AND val clips bound
    them), or None when any scan can't prove a bound / the lever would not
    shrink. Both stay None under a context-sharded mesh: the loader pads the
    frame axis to the context multiple and the ring shards it — truncation
    and the cross-shard live-row gather would break that layout
    (models/stlt.py apply_frame_capacity / SpatialTransformer contracts)."""
    if not (getattr(args, "live_prefix", False) and args.use_pallas):
        return None, None
    if getattr(args, "context_parallel", 1) > 1:
        return None, None
    fcaps = [frame_capacity_for(ds, cfg) for ds, cfg in dataset_cfgs]
    frame_cap = None if any(c is None for c in fcaps) else max(fcaps)
    caps = [
        spatial_live_capacity_for(ds, cfg, args.batch_size,
                                  frame_axis=frame_cap)
        for ds, cfg in dataset_cfgs
    ]
    return (None if any(c is None for c in caps) else max(caps)), frame_cap
from stlt_tpu.data import collaters_factory, datasets_factory
from stlt_tpu.data.loader import Loader, device_prefetch
from stlt_tpu.models import models_factory
from stlt_tpu.parallel.mesh import make_mesh
from stlt_tpu.parser import build_parser
from stlt_tpu.training import checkpoint as ckpt
from stlt_tpu.training.criterion import make_criterion
from stlt_tpu.training.evaluation import evaluators_factory
from stlt_tpu.training.loop import (
    EvalCountAccumulator,
    EvalProbsAccumulator,
    compile_steps,
    create_train_state,
)
from stlt_tpu.training.optimizer import make_optimizer, model_no_decay_names


def setup_logging(log_filepath, *, coordinator: bool = True):
    # Multi-process: only process 0 owns the log file (the reference's
    # refuse-to-overwrite check, src/train.py:26-27, applies to it alone).
    if log_filepath and coordinator:
        if os.path.exists(log_filepath):
            raise ValueError(f"There is a log at {log_filepath}!")
        logging.basicConfig(level=logging.INFO, filename=log_filepath, filemode="w")
    else:
        logging.basicConfig(level=logging.INFO)


def build_data_config(args, *, train: bool, dataset_path: str) -> DataConfig:
    return DataConfig(
        dataset_name=args.dataset_name,
        dataset_path=dataset_path,
        labels_path=args.labels_path,
        videoid2size_path=args.videoid2size_path,
        videos_path=args.videos_path,
        train=train,
        layout_num_frames=args.layout_num_frames,
        appearance_num_frames=args.appearance_num_frames,
        score_threshold=args.score_threshold,
        spatial_size=args.spatial_size,
        frames_multiple=getattr(args, "context_parallel", 1),
        fast_decode=args.fast_decode,
        native_decode=getattr(args, "native_decode", False),
        device_normalize=getattr(args, "device_normalize", False),
    )


import dataclasses
from typing import Any, Dict, List


@dataclasses.dataclass
class TrainResult:
    """What ``train()`` returns: the final train state plus MACHINE-READABLE
    per-epoch records (steps, seconds, loss, metrics) — the structured
    telemetry surface bench.py and any driver consumes instead of scraping
    log strings. ``step``/``params`` pass through to the state so existing
    ``train(args).params``-style callers keep working."""

    state: Any
    epochs: List[Dict[str, Any]]

    @property
    def step(self):
        return self.state.step

    @property
    def params(self):
        return self.state.params


def model_inputs_template(batch):
    return {k: v for k, v in batch.items() if k not in ("labels", "valid")}


def make_template_batch(dataset, dataset_type, data_cfg):
    """One-sample batch with the Loader's key set (incl. the valid mask)."""
    collate = collaters_factory[dataset_type](data_cfg)
    batch = collate([dataset[0]])
    batch["valid"] = np.ones((1,), bool)
    return batch


def train(args):
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    from stlt_tpu.parallel.distributed import (
        is_coordinator,
        maybe_initialize,
        process_row_span,
    )

    multiprocess = maybe_initialize(args)
    from stlt_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    setup_logging(args.log_filepath, coordinator=is_coordinator())
    # Optional profiler trace of a few warm steps (SURVEY.md §5 tracing —
    # the reference has only tqdm progress bars). Validated up front.
    profile_window = None
    if args.profile_dir:
        start, stop = (int(x) for x in getattr(args, "profile_window", "10,15").split(","))
        if not 0 <= start < stop:
            raise ValueError(
                f"--profile_window must be START,STOP with 0 <= START < STOP, "
                f"got {args.profile_window!r}"
            )
        profile_window = (start, stop)
    logging.info("Devices: %s", jax.devices())
    if multiprocess:
        logging.info(
            "Multi-process: %d processes x %d local devices",
            jax.process_count(), jax.local_device_count(),
        )
    mesh = make_mesh(args.model_parallel, batch_size=args.batch_size,
                     context_parallel=args.context_parallel)
    # The contiguous global-batch rows this process materializes (the whole
    # batch when single-process).
    from stlt_tpu.parallel.mesh import batch_sharding as data_sharding

    rows = (
        process_row_span(data_sharding(mesh), args.batch_size)
        if multiprocess
        else None
    )
    logging.info("Preparing datasets...")
    train_cfg = build_data_config(args, train=True, dataset_path=args.train_dataset_path)
    val_cfg = build_data_config(args, train=False, dataset_path=args.val_dataset_path)
    train_dataset = datasets_factory[args.dataset_type](train_cfg)
    val_dataset = datasets_factory[args.dataset_type](val_cfg)
    num_classes = len(val_dataset.labels)
    logging.info("Training on %d", len(train_dataset))
    logging.info("Validating on %d", len(val_dataset))

    train_loader = Loader(
        train_dataset,
        args.batch_size,
        collaters_factory[args.dataset_type](train_cfg),
        shuffle=True,
        seed=args.seed,
        prefetch=max(args.num_workers, 2),
        workers=max(args.num_workers, 1),
        rows=rows,
    )
    val_loader = Loader(
        val_dataset,
        args.batch_size,
        collaters_factory[args.dataset_type](val_cfg),
        prefetch=max(args.num_workers, 2),
        workers=max(args.num_workers, 1),
        rows=rows,
    )

    logging.info("Preparing model...")
    live_cap, frame_cap = _live_prefix_caps(
        args, (train_dataset, train_cfg), (val_dataset, val_cfg)
    )
    model_config = make_model_config(
        args.model_name,
        num_classes=num_classes,
        layout_num_frames=position_table_rows(val_cfg),
        appearance_num_frames=args.appearance_num_frames,
        unique_categories=len(category2id_for(args.dataset_name)),
        num_spatial_layers=args.num_spatial_layers,
        num_temporal_layers=args.num_temporal_layers,
        load_backbone_path=args.load_backbone_path,
        freeze_backbone=args.freeze_backbone,
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

    # Init params from one template batch (built directly — consuming one
    # item of the Loader iterator would strand its producer thread holding
    # prefetched batches for the whole run).
    template_batch = make_template_batch(val_dataset, args.dataset_type, val_cfg)
    # init runs eagerly — make sure no stale context mesh routes attention
    # through the ring path (compile_steps re-registers the mesh below).
    from stlt_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(None)
    params = model.init(
        jax.random.PRNGKey(args.seed), model_inputs_template(template_batch)
    )["params"]
    if args.resnet_model_path:
        # Kinetics R3D-50 init (reference Resnet3D.__init__, models.py:201-204).
        # Order matters: Kinetics init happens at module CONSTRUCTION in the
        # reference, so a loaded backbone must override it — not the reverse.
        from stlt_tpu.utils.convert import load_kinetics_r3d

        params = load_kinetics_r3d(params, args.resnet_model_path)
        logging.info("Loaded Kinetics R3D from %s", args.resnet_model_path)
    if args.load_backbone_path:
        # Backbone-only load (reference StltBackbone.from_pretrained,
        # models.py:130-134; fusion models load the whole
        # CrossAttentionFusionBackbone — the path that is a latent
        # AttributeError upstream, models.py:509-512).
        params["backbone"] = ckpt.load_params(
            args.load_backbone_path, params["backbone"]
        )
        logging.info("Loaded backbone from %s", args.load_backbone_path)

    criterion = make_criterion(args.dataset_name)
    num_batches = len(train_dataset) // args.batch_size
    tx = make_optimizer(
        params,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        clip_val=args.clip_val,
        num_warmup_steps=args.warmup_epochs * num_batches,
        num_training_steps=args.epochs * num_batches,
        freeze_backbone=bool(args.freeze_backbone and args.load_backbone_path),
        # Ask the MODEL for its declared no-decay set (reference hasattr
        # semantics, train_inference_utils.py:44-46).
        no_decay_names=model_no_decay_names(model),
    )
    state = create_train_state(params, tx)

    grad_accum = max(getattr(args, "grad_accum_steps", 1), 1)
    if args.batch_size % grad_accum:
        raise ValueError(
            f"--grad_accum_steps {grad_accum} must divide --batch_size "
            f"{args.batch_size}"
        )
    steps = compile_steps(mesh, model, tx, criterion, state=state,
                          batch_template=template_batch,
                          grad_accum=grad_accum)
    from stlt_tpu.parallel.distributed import put_tree

    state = put_tree(state, steps.state_sharding)
    # Host scalar; the (rbg) PRNG key is built inside the jitted step.
    dropout_seed = np.uint32(args.seed + 1)

    manager = ckpt.make_checkpoint_manager(args.resume_dir) if args.resume_dir else None
    start_epoch = 0
    if manager is not None:
        restored = ckpt.restore_train_state(manager, state)
        if restored is not None:
            state = (
                restored  # multi-process restore is already mesh-sharded
                if jax.process_count() > 1
                else jax.device_put(restored, steps.state_sharding)
            )
            start_epoch = int(jax.device_get(state.step)) // max(1, len(train_loader))
            # Keep the data order of an uninterrupted run: the loader's
            # shuffle/augmentation RNG is keyed on (seed, epoch).
            train_loader.epoch = start_epoch
            logging.info("Resumed at step %d (epoch %d)", int(jax.device_get(state.step)), start_epoch)

    evaluator = evaluators_factory[args.dataset_name](
        len(val_dataset), num_classes, model.logit_names
    )
    logging.info("Starting training...")
    global_step = int(jax.device_get(state.step))
    epoch_records = []
    for epoch in range(start_epoch, args.epochs):
        epoch_start = time.time()
        # Losses stay ON DEVICE through the epoch (one scalar buffer per
        # step); a single host fetch happens at the epoch boundary. A
        # per-step float(loss) would force a device→host sync every step
        # and serialize the double-buffered pipeline (~70ms RTT here).
        losses, seen = [], 0
        for batch in device_prefetch(
            train_loader, steps.batch_sharding, global_batch_size=args.batch_size
        ):
            if profile_window and global_step == profile_window[0]:
                jax.profiler.start_trace(args.profile_dir)
            state, loss = steps.train_step(state, batch, dropout_seed)
            losses.append(loss)
            seen += 1
            global_step += 1
            if profile_window and global_step == profile_window[1]:
                jax.profiler.stop_trace()
                profile_window = None
                logging.info("Wrote profiler trace to %s", args.profile_dir)
        epoch_loss = float(np.mean(jax.device_get(losses))) if losses else 0.0
        train_seconds = time.time() - epoch_start
        logging.info(
            "Epoch %d: train loss %.6f (%d steps, %.3fs)",
            epoch + 1, epoch_loss, seen, train_seconds,
        )
        # Validation. Both dataset families accumulate ON DEVICE with ONE
        # host fetch per epoch: Something as top-k counts (two ints/head/
        # batch), Action Genome as sigmoid predictions (Charades mAP needs
        # them all, but not one ~70ms-RTT round trip per batch).
        eval_start = time.time()
        evaluator.reset()
        count_path = hasattr(evaluator, "process_counts")
        probs_path = not count_path and hasattr(evaluator, "process_probs")
        count_acc = EvalCountAccumulator()
        probs_acc = EvalProbsAccumulator()
        for batch in device_prefetch(
            val_loader, steps.batch_sharding, global_batch_size=args.batch_size
        ):
            if count_path:
                count_acc.add(steps.eval_counts_step(state.params, batch))
            elif probs_path:
                probs_acc.add(steps.eval_probs_step(state.params, batch))
            else:
                logits = steps.eval_step(state.params, batch)
                evaluator.process(
                    {k: np.asarray(v) for k, v in logits.items()},
                    steps.to_host(batch["labels"]),
                    valid=steps.to_host(batch["valid"]),
                )
        count_acc.flush_into(evaluator)
        probs_acc.flush_into(evaluator)
        metrics = evaluator.evaluate()
        is_best = evaluator.is_best()
        if is_best:
            logging.info("=================================")
            logging.info("Found new best on epoch %d!", epoch + 1)
            logging.info("=================================")
            # save_params is collective-safe: all processes participate in
            # the gather, process 0 writes.
            ckpt.save_params(args.save_model_path, state.params)
            if args.save_backbone_path:
                ckpt.save_params(args.save_backbone_path, state.params["backbone"])
        if manager is not None:
            ckpt.save_train_state(manager, int(jax.device_get(state.step)), state)
        for m, v in metrics.items():
            logging.info("%s: %s", m, round(v * 100, 2))
        epoch_records.append(
            {
                "epoch": epoch + 1,
                "global_step": global_step,
                "steps": seen,
                "train_seconds": round(train_seconds, 6),
                "train_loss": epoch_loss,
                "eval_seconds": round(time.time() - eval_start, 6),
                "metrics": dict(metrics),
                "is_best": is_best,
            }
        )
    if manager is not None:
        manager.wait_until_finished()
    return TrainResult(state=state, epochs=epoch_records)


def main():
    parser = build_parser("Trains a model, currently STLT, LCF, CAF, and CACNF.")
    train(parser.parse_args())


if __name__ == "__main__":
    main()
