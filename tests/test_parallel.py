"""Mesh/sharding correctness on the 8-device virtual CPU mesh.

Tensor parallelism must be numerically invisible: the same params and batch
must produce (near-)identical logits and losses for model_parallel ∈ {1, 2, 4}.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from __graft_entry__ import _synthetic_layout_batch
from stlt_tpu.configs import StltModelConfig
from stlt_tpu.models import models_factory
from stlt_tpu.parallel.mesh import make_mesh
from stlt_tpu.parallel.sharding import param_spec, params_partition_specs
from stlt_tpu.training.criterion import make_criterion
from stlt_tpu.training.loop import compile_steps, create_train_state
from stlt_tpu.training.optimizer import make_optimizer


def test_mesh_shapes():
    mesh = make_mesh(2)
    assert mesh.shape == {"data": 4, "model": 2, "context": 1}
    mesh = make_mesh(1, batch_size=4)
    assert mesh.shape == {"data": 4, "model": 1, "context": 1}


def test_param_specs():
    assert param_spec(("a", "q_proj", "kernel")) == P(None, "model")
    assert param_spec(("a", "q_proj", "bias")) == P("model")
    assert param_spec(("a", "out_proj", "kernel")) == P("model", None)
    assert param_spec(("a", "out_proj", "bias")) == P()
    assert param_spec(("a", "linear1", "kernel")) == P(None, "model")
    assert param_spec(("a", "linear2", "kernel")) == P("model", None)
    assert param_spec(("a", "layer_norm", "scale")) == P()
    assert param_spec(("a", "category_embeddings", "embedding")) == P()


@pytest.fixture(scope="module")
def tiny_setup():
    config = StltModelConfig(
        num_classes=7,
        unique_categories=4,
        hidden_size=32,
        num_attention_heads=4,
        num_spatial_layers=1,
        num_temporal_layers=1,
        hidden_dropout_prob=0.0,
    )
    model = models_factory["stlt"](config)
    batch = _synthetic_layout_batch(8, 6, 4, 4, seed=5)
    batch["labels"] = batch["labels"] % 7
    batch["valid"] = np.ones(8, bool)
    inputs = {k: v for k, v in batch.items() if k not in ("labels", "valid")}
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    return model, params, batch


@pytest.mark.parametrize("model_parallel", [1, 2, 4])
def test_tp_invariant_eval(tiny_setup, model_parallel):
    model, params, batch = tiny_setup
    mesh = make_mesh(model_parallel)
    steps = compile_steps(mesh, model, params_template=params)
    sharded = jax.device_put(params, steps.params_sharding)
    logits = np.asarray(steps.eval_step(sharded, batch)["stlt"])
    # single-device reference
    inputs = {k: v for k, v in batch.items() if k not in ("labels", "valid")}
    ref = np.asarray(model.apply({"params": params}, inputs)["stlt"])
    np.testing.assert_allclose(logits, ref, atol=1e-5, rtol=1e-5)


def test_tp_invariant_train_loss(tiny_setup):
    model, params, batch = tiny_setup
    criterion = make_criterion("something")
    losses = {}
    for mp in (1, 2):
        # deep-copy: train_step donates its state, and device_put to an
        # identical sharding aliases rather than copies
        run_params = jax.tree_util.tree_map(np.array, params)
        tx = make_optimizer(
            run_params, learning_rate=1e-3, weight_decay=1e-3, clip_val=5.0,
            num_warmup_steps=1, num_training_steps=10,
        )
        state = create_train_state(run_params, tx)
        mesh = make_mesh(mp)
        steps = compile_steps(mesh, model, tx, criterion, state=state)
        state = jax.device_put(state, steps.state_sharding)
        for _ in range(3):
            state, loss = steps.train_step(state, batch, np.uint32(9))
        losses[mp] = float(loss)
    assert np.isfinite(losses[1])
    np.testing.assert_allclose(losses[1], losses[2], atol=1e-4, rtol=1e-4)


def test_context_parallel_eval_matches():
    """Sequence parallelism (frame axis over the context mesh axis) must be
    numerically invisible."""
    from stlt_tpu.training.loop import batch_shardings

    config = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
        hidden_dropout_prob=0.0,
    )
    model = models_factory["stlt"](config)
    # frame axis 8 divides context=2
    batch = _synthetic_layout_batch(4, 8, 4, 4, seed=6)
    batch["labels"] = batch["labels"] % 7
    batch["valid"] = np.ones(4, bool)
    inputs = {k: v for k, v in batch.items() if k not in ("labels", "valid")}
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    ref = np.asarray(model.apply({"params": params}, inputs)["stlt"])

    mesh = make_mesh(model_parallel=2, context_parallel=2)  # data=2,model=2,ctx=2
    assert mesh.shape == {"data": 2, "model": 2, "context": 2}
    steps = compile_steps(mesh, model, params_template=params, batch_template=batch)
    sharded = jax.device_put(params, steps.params_sharding)
    got = np.asarray(steps.eval_step(sharded, batch)["stlt"])
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
    # the frame-axis inputs really are context-sharded
    shardings = batch_shardings(mesh, batch)
    assert shardings["categories"].spec == P("data", "context")
    assert shardings["labels"].spec == P("data")


def test_opt_state_shardings_path_based(tiny_setup):
    """tree_shardings_like must TP-shard adamw moments through masked/
    multi_transform wrappers (path-suffix matching, not structural equality),
    and replicate scalars/MaskedNodes. VERDICT r1 #10 / ADVICE r1 #2."""
    import optax

    from stlt_tpu.parallel.sharding import params_shardings, tree_shardings_like
    from jax.sharding import PartitionSpec

    model, params, batch = tiny_setup
    mesh = make_mesh(2)
    p_shard = params_shardings(mesh, params)

    # A DIFFERENT chain than the production one: masked sgd-momentum +
    # inject_hyperparams-wrapped adamw.
    flat = jax.tree_util.tree_map(lambda _: True, params)
    tx = optax.chain(
        optax.masked(optax.sgd(1e-3, momentum=0.9), flat),
        optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3),
    )
    opt_state = tx.init(params)
    shardings = tree_shardings_like(mesh, opt_state, p_shard)

    flat_shard, _ = jax.tree_util.tree_flatten_with_path(shardings)
    def dict_key(entry):
        return entry.key if isinstance(entry, jax.tree_util.DictKey) else None

    tp_specs = [
        s.spec for path, s in flat_shard
        if any(dict_key(p) == "q_proj" for p in path)
        and dict_key(path[-1]) == "kernel"
    ]
    # sgd trace + adamw mu + adamw nu for every q_proj kernel
    assert tp_specs, "no q_proj kernel leaves found in opt state"
    assert all(s == PartitionSpec(None, "model") for s in tp_specs), tp_specs

    # and the whole thing actually runs as a train step
    from stlt_tpu.training.criterion import make_criterion

    criterion = make_criterion("something")
    # deep-copy: the donated train step would delete the module-scoped params
    run_params = jax.tree_util.tree_map(np.array, params)
    state = create_train_state(run_params, tx)
    steps = compile_steps(mesh, model, tx, criterion, state=state)
    state = jax.device_put(state, steps.state_sharding)
    state, loss = steps.train_step(state, batch, np.uint32(3))
    assert np.isfinite(float(loss))


def test_eval_counts_step_matches_host_evaluator(tiny_setup):
    """On-device top-1/top-5 accumulation == the host logits path."""
    from stlt_tpu.training.evaluation import EvaluatorSomething

    model, params, batch = tiny_setup
    batch = dict(batch)
    batch["valid"] = np.array([True] * 6 + [False] * 2)
    mesh = make_mesh(2)
    steps = compile_steps(mesh, model, params_template=params, batch_template=batch)
    sharded = jax.device_put(params, steps.params_sharding)

    host = EvaluatorSomething(6, 7, model.logit_names)
    logits = steps.eval_step(sharded, batch)
    host.process(
        {k: np.asarray(v) for k, v in logits.items()},
        batch["labels"], valid=batch["valid"],
    )

    device = EvaluatorSomething(6, 7, model.logit_names)
    device.process_counts(jax.device_get(steps.eval_counts_step(sharded, batch)))
    assert device.evaluate() == host.evaluate()


def test_tp_invariance_with_pallas_kernels():
    """use_pallas under model parallelism: logits must match mp=1 bitwise-
    modulo-f32. (On the CPU mesh the kernels lower through the interpreter,
    which GSPMD shards like regular ops; on real multi-chip TP the opaque
    custom call is replicated around — correct, with extra collectives —
    see docs/ARCHITECTURE.md.)"""
    import numpy as np

    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory
    from stlt_tpu.parallel.mesh import make_mesh, set_active_mesh
    from stlt_tpu.training.loop import compile_steps

    cfg = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
        use_pallas=True,
    )
    model = models_factory["stlt"](cfg)
    batch = _synthetic_layout_batch(8, 6, 4, 4, seed=0)
    batch["valid"] = np.ones(8, bool)
    inputs = {k: v for k, v in batch.items() if k not in ("labels", "valid")}
    set_active_mesh(None)
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    outs = {}
    for mp in (1, 2, 4):
        mesh = make_mesh(mp)
        steps = compile_steps(mesh, model, params_template=params,
                              batch_template=batch)
        p = jax.device_put(params, steps.params_sharding)
        outs[mp] = np.asarray(steps.eval_step(p, batch)["stlt"])
    np.testing.assert_allclose(outs[2], outs[1], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(outs[4], outs[1], atol=1e-5, rtol=1e-5)
