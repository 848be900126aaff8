"""Ring (sequence-parallel) attention vs the gather-based reference.

Runs on the 8-virtual-CPU-device mesh: K/V chunks rotate via ppermute over
the ``context`` axis; results must match plain attention bit-for-bit-modulo
f32 reduction order, including causal + key-padding bias and the fused
attention-probability dropout mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stlt_tpu.ops import masks
from stlt_tpu.ops.attention import dot_product_attention_reference
from stlt_tpu.ops.ring import ring_attention
from stlt_tpu.parallel.mesh import make_mesh, set_active_mesh


@pytest.fixture(autouse=True)
def _clean_mesh():
    set_active_mesh(None)
    yield
    set_active_mesh(None)


def _qkv(rng, B, T, N, D):
    q = jnp.asarray(rng.normal(0, 1, (B, T, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, T, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, N, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("context", [2, 4])
def test_ring_matches_reference(context):
    mesh = make_mesh(model_parallel=2, context_parallel=context)
    rng = np.random.default_rng(0)
    B, T, N, D = 4, 16, 4, 8
    q, k, v = _qkv(rng, B, T, N, D)
    pad = np.zeros((B, T), bool)
    pad[:, -3:] = True
    bias = masks.causal_bias(T) + masks.key_padding_bias(jnp.asarray(pad))

    got = jax.jit(lambda *a: ring_attention(*a, mesh))(q, k, v, bias)
    want = dot_product_attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_ring_with_dropout_mask_matches_reference():
    mesh = make_mesh(model_parallel=1, context_parallel=2)
    rng = np.random.default_rng(1)
    B, T, N, D, rate = 4, 8, 2, 8, 0.3
    q, k, v = _qkv(rng, B, T, N, D)
    keep = jnp.asarray(rng.random((B, N, T, T)) > rate, jnp.float32)
    bias = masks.causal_bias(T)

    got = jax.jit(
        lambda *a: ring_attention(*a, mesh, dropout_mask=keep, dropout_rate=rate)
    )(q, k, v, bias)
    want = dot_product_attention_reference(q, k, v, bias, keep, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_ring_gradients_match_reference():
    mesh = make_mesh(model_parallel=1, context_parallel=2)
    rng = np.random.default_rng(2)
    B, T, N, D = 4, 8, 2, 8
    q, k, v = _qkv(rng, B, T, N, D)
    bias = masks.causal_bias(T)

    gk = jax.jit(
        jax.grad(lambda *a: ring_attention(*a, bias, mesh).sum(), (0, 1, 2))
    )(q, k, v)
    gr = jax.grad(
        lambda *a: dot_product_attention_reference(*a, bias).sum(), (0, 1, 2)
    )(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_stlt_eval_ring_matches_unsharded():
    """Full STLT under a context-parallel mesh (ring temporal attention, via
    the seq_shard flag + active-mesh registry) equals the single-mesh run."""
    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory
    from stlt_tpu.training.loop import compile_steps

    cfg = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=2,
    )
    model = models_factory["stlt"](cfg)
    batch = _synthetic_layout_batch(4, 8, 4, 4, seed=3)
    batch["valid"] = np.ones((4,), bool)
    inputs = {k: v for k, v in batch.items() if k not in ("labels", "valid")}
    set_active_mesh(None)
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]

    outs = {}
    for context in (1, 2):
        mesh = make_mesh(model_parallel=2, context_parallel=context)
        steps = compile_steps(mesh, model, params_template=params,
                              batch_template=batch)
        p = jax.device_put(params, steps.params_sharding)
        outs[context] = np.asarray(steps.eval_step(p, batch)["stlt"])
    np.testing.assert_allclose(outs[2], outs[1], atol=1e-5, rtol=1e-5)
