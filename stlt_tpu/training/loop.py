"""Compiled train/eval steps over a device mesh.

The TPU-native replacement for the reference's Python training loop body
(``src/train.py:115-143``): the zero_grad → forward → loss → backward → clip →
AdamW step → LR-schedule chain is fused into ONE ``jit``-compiled, donated,
mesh-sharded ``train_step``. Batches are sharded over the ``data`` axis;
parameters/optimizer state follow the TP rules in
``stlt_tpu.parallel.sharding`` (replicated when ``model_parallel == 1``).
XLA emits the gradient all-reduce — there is no hand-written communication.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stlt_tpu.parallel.mesh import CONTEXT_AXIS, DATA_AXIS
from stlt_tpu.parallel.sharding import params_shardings, tree_shardings_like

# Batch entries whose dim 1 is the layout frame axis — shardable over the
# `context` mesh axis (sequence parallelism). The spatial encoder then runs
# fully frame-sharded (frames fold into the batch), and XLA inserts the
# all-gathers the temporal attention needs.
FRAME_AXIS_KEYS = ("categories", "boxes", "scores", "frame_types")


def batch_shardings(mesh: Mesh, batch_template: Dict[str, Any]) -> Dict[str, NamedSharding]:
    context = mesh.shape.get(CONTEXT_AXIS, 1)
    out = {}
    for key in batch_template:
        if context > 1 and key in FRAME_AXIS_KEYS:
            frames = getattr(batch_template[key], "shape", (0, 0))[1]
            if frames % context:
                raise ValueError(
                    f"context_parallel={context} does not divide the frame "
                    f"axis ({key} has {frames} frames). The train/inference "
                    "CLIs pad via DataConfig.frames_multiple; non-CLI "
                    "callers must pad the frame axis to a multiple of the "
                    "context axis themselves."
                )
            out[key] = NamedSharding(mesh, P(DATA_AXIS, CONTEXT_AXIS))
        else:
            out[key] = NamedSharding(mesh, P(DATA_AXIS))
    return out


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    criterion: Callable,
    rng_impl: str = "rbg",
    grad_accum: int = 1,
) -> Callable:
    """Returns train_step(state, batch, dropout_seed) -> (state, loss).

    ``dropout_seed`` is a plain uint32 scalar (NOT a key array): the PRNG key
    is built inside the jitted step, so callers can pass host numpy scalars —
    which jit replicates across processes for free — instead of device_put-ing
    a key array onto a (possibly multi-host) mesh. rbg is ~16% faster than
    threefry on TPU for the dropout-bits-dominated steps.

    ``grad_accum > 1`` splits the global batch into that many microbatches
    inside the SAME jitted step (``lax.scan``), accumulating valid-row-
    weighted loss sums and gradients so the update equals the full-batch one
    (up to fp reassociation) at 1/k the activation memory. The split is
    STRIDED (sample ``i`` → microbatch ``i % k``), which reshapes without
    moving data across the ``data`` mesh axis.
    """

    def _micro_update(params, micro_batch, rng_i):
        valid = micro_batch.get("valid")
        labels = micro_batch["labels"]
        n = (
            valid.sum().astype(jnp.float32)
            if valid is not None
            else jnp.asarray(labels.shape[0], jnp.float32)
        )
        model_inputs = {
            k: v for k, v in micro_batch.items() if k not in ("labels", "valid")
        }

        def loss_sum_fn(params):
            logits = model.apply(
                {"params": params},
                model_inputs,
                deterministic=False,
                rngs={"dropout": rng_i},
            )
            # criterion is a valid-weighted mean; × n gives the weighted SUM,
            # which accumulates exactly across microbatches.
            return criterion(logits, labels, valid) * n

        loss_sum, grads = jax.value_and_grad(loss_sum_fn)(params)
        return loss_sum, grads, n

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], dropout_seed):
        rng = jax.random.fold_in(
            jax.random.key(dropout_seed, impl=rng_impl), state.step
        )
        if grad_accum == 1:
            valid = batch.get("valid")
            model_inputs = {
                k: v for k, v in batch.items() if k not in ("labels", "valid")
            }

            def loss_fn(params):
                logits = model.apply(
                    {"params": params},
                    model_inputs,
                    deterministic=False,
                    rngs={"dropout": rng},
                )
                return criterion(logits, batch["labels"], valid)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        else:
            batch_size = batch["labels"].shape[0]
            if batch_size % grad_accum:
                raise ValueError(
                    f"grad_accum={grad_accum} does not divide batch {batch_size}"
                )

            def to_micro(x):
                # [B, ...] → [k, B/k, ...] strided: keeps each microbatch
                # spread evenly over the data-sharded axis (no resharding).
                return x.reshape(batch_size // grad_accum, grad_accum, *x.shape[1:]) \
                        .swapaxes(0, 1)

            micro = jax.tree_util.tree_map(to_micro, batch)

            def body(carry, idx_and_mb):
                idx, mb = idx_and_mb
                loss_acc, g_acc, n_acc = carry
                loss_sum, grads, n = _micro_update(
                    state.params, mb, jax.random.fold_in(rng, idx)
                )
                return (
                    loss_acc + loss_sum,
                    jax.tree_util.tree_map(jnp.add, g_acc, grads),
                    n_acc + n,
                ), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss_sum, grads, n), _ = jax.lax.scan(
                body,
                (jnp.zeros((), jnp.float32), zeros, jnp.zeros((), jnp.float32)),
                (jnp.arange(grad_accum), micro),
            )
            n = jnp.maximum(n, 1.0)
            loss = loss_sum / n
            grads = jax.tree_util.tree_map(lambda g: g / n, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            loss,
        )

    return train_step


def make_eval_step(model) -> Callable:
    def eval_step(params: Any, batch: Dict[str, jnp.ndarray]):
        model_inputs = {
            k: v for k, v in batch.items() if k not in ("labels", "valid")
        }
        return model.apply({"params": params}, model_inputs, deterministic=True)

    return eval_step


def make_eval_counts_step(model) -> Callable:
    """Forward + ON-DEVICE top-1/top-5 correct counts (Something metrics).

    The host fetches two ints per head per batch instead of the full [B, C]
    f32 logits — the difference matters through this environment's ~70ms-RTT
    device link, and in multi-process runs the counts come back replicated
    so every process reads them locally (SURVEY.md §5 metrics row).
    """

    def eval_counts_step(params: Any, batch: Dict[str, jnp.ndarray]):
        model_inputs = {
            k: v for k, v in batch.items() if k not in ("labels", "valid")
        }
        logits = model.apply({"params": params}, model_inputs, deterministic=True)
        labels = batch["labels"]
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones(labels.shape, bool)
        counts = {}
        for name, arr in logits.items():
            k = min(5, arr.shape[-1])
            top1 = (jnp.argmax(arr, axis=-1) == labels) & valid
            # lax.top_k: ties break toward lower index, same as torch.topk
            # (reference evaluation.py:25-34).
            _, top_idx = jax.lax.top_k(arr, k)
            top5 = jnp.any(top_idx == labels[:, None], axis=-1) & valid
            counts[name] = (
                top1.sum().astype(jnp.int32),
                top5.sum().astype(jnp.int32),
            )
        return counts

    return eval_counts_step


def make_eval_probs_step(model) -> Callable:
    """Forward + ON-DEVICE sigmoid over the ``stlt`` head (the only head the
    Action Genome evaluator reads, reference evaluation.py:76-83).

    Pairs with ``EvalProbsAccumulator``: mAP needs every prediction host-side,
    but nothing forces a per-batch fetch of [B, C] f32 logits through the
    ~70ms-RTT device link — sigmoid probabilities stay on device across the
    epoch and come back in ONE fetch, mirroring the Something counts path."""

    def eval_probs_step(params: Any, batch: Dict[str, jnp.ndarray]):
        model_inputs = {
            k: v for k, v in batch.items() if k not in ("labels", "valid")
        }
        logits = model.apply({"params": params}, model_inputs, deterministic=True)
        probs = jax.nn.sigmoid(logits["stlt"].astype(jnp.float32))
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones(probs.shape[0], bool)
        # Labels/valid ride along REPLICATED (the step's out_sharding), so
        # multi-process runs can device_get them without extra collectives.
        return probs, batch["labels"], valid

    return eval_probs_step


class EvalProbsAccumulator:
    """Accumulates per-batch ON-DEVICE (probs, labels, valid) triples across
    an eval pass; ``flush_into`` performs the single host fetch and feeds the
    evaluator. The device arrays are tiny ([B, C] f32) — holding an epoch's
    worth costs a few MB of HBM and saves one ~70ms round trip per batch."""

    def __init__(self):
        self.items = []

    def add(self, triple) -> None:
        self.items.append(triple)

    def flush_into(self, evaluator) -> None:
        for probs, labels, valid in jax.device_get(self.items):
            evaluator.process_probs(probs, labels, valid=valid)
        self.items = []


class EvalCountAccumulator:
    """Accumulates ``eval_counts_step`` outputs ON DEVICE across an eval
    pass; ``flush_into`` performs the single host fetch (vs one ~70ms-RTT
    ``device_get`` per batch through this environment's relay). Shared by
    the train-loop validation pass and the inference CLI."""

    def __init__(self):
        self.totals = None

    def add(self, counts) -> None:
        self.totals = (
            counts
            if self.totals is None
            else jax.tree_util.tree_map(jnp.add, self.totals, counts)
        )

    def flush_into(self, evaluator) -> None:
        if self.totals is not None:
            evaluator.process_counts(jax.device_get(self.totals))
        self.totals = None


@dataclasses.dataclass
class CompiledSteps:
    mesh: Mesh
    state_sharding: Any
    params_sharding: Any
    batch_sharding: Any  # per-key dict when batch_template given, else one sharding
    train_step: Optional[Callable]
    eval_step: Callable
    eval_counts_step: Optional[Callable] = None
    eval_probs_step: Optional[Callable] = None
    replicated_sharding: Any = None
    _replicate: Optional[Callable] = None

    def to_host(self, x) -> "Any":
        """Device array → host numpy, multi-process safe.

        Data-sharded arrays are not fully addressable when processes > 1;
        a tiny jitted identity with replicated out_sharding performs the
        all-gather (a collective — call from every process)."""
        import numpy as np

        if jax.process_count() > 1 and isinstance(x, jax.Array):
            return np.asarray(self._replicate(x))
        return np.asarray(x)


def compile_steps(
    mesh: Mesh,
    model,
    tx: Optional[optax.GradientTransformation] = None,
    criterion: Optional[Callable] = None,
    state: Optional[TrainState] = None,
    params_template: Any = None,
    batch_template: Optional[Dict[str, Any]] = None,
    rng_impl: str = "rbg",
    grad_accum: int = 1,
) -> CompiledSteps:
    """Wrap train/eval steps in jit with explicit mesh shardings.

    Pass ``state`` (+ ``tx``/``criterion``) for training, or just
    ``params_template`` for inference-only. The returned
    ``state_sharding``/``params_sharding`` trees are what the caller should
    ``device_put`` its state/params with before the first step.
    ``batch_template`` (any batch dict) enables per-key shardings — required
    when the mesh has a context (sequence-parallel) axis.
    """
    # Register the mesh so seq_shard attention layers can run the ppermute
    # ring (ops/ring.py) when a context axis is present.
    from stlt_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(mesh)

    if batch_template is not None:
        batch_shard = batch_shardings(mesh, batch_template)
    else:
        batch_shard = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())

    p_template = state.params if state is not None else params_template
    assert p_template is not None, "need state or params_template"
    p_shard = params_shardings(mesh, p_template)

    state_sharding = None
    train_step = None
    if state is not None and tx is not None:
        state_sharding = TrainState(
            step=replicated,
            params=p_shard,
            opt_state=tree_shardings_like(mesh, state.opt_state, p_shard),
        )
        raw_train = make_train_step(
            model, tx, criterion, rng_impl=rng_impl, grad_accum=grad_accum
        )
        train_step = jax.jit(
            raw_train,
            in_shardings=(state_sharding, batch_shard, replicated),
            out_shardings=(state_sharding, replicated),
            donate_argnums=(0,),
        )

    # Replicated eval logits: every process can read them directly (the
    # all-gather is emitted once by XLA instead of per-consumer fetches).
    eval_step = jax.jit(
        make_eval_step(model),
        in_shardings=(p_shard, batch_shard),
        out_shardings=replicated,
    )

    # jit is lazy — nothing compiles unless a caller actually uses it.
    eval_counts_step = jax.jit(
        make_eval_counts_step(model),
        in_shardings=(p_shard, batch_shard),
        out_shardings=replicated,
    )
    eval_probs_step = jax.jit(
        make_eval_probs_step(model),
        in_shardings=(p_shard, batch_shard),
        out_shardings=replicated,
    )

    return CompiledSteps(
        mesh=mesh,
        state_sharding=state_sharding,
        params_sharding=p_shard,
        batch_sharding=batch_shard,
        train_step=train_step,
        eval_step=eval_step,
        eval_counts_step=eval_counts_step,
        eval_probs_step=eval_probs_step,
        replicated_sharding=replicated,
        _replicate=jax.jit(lambda x: x, out_shardings=replicated),
    )
