"""Parity tests for the fused TRAIN layer tail (ops/fused_tail_train.py).

The oracle is a mask-matched XLA chain mirroring the kernel's math step for
step (same cast points, f32 GEMM accumulation, hashed keep bits rebuilt via
``hash_keep_rows``) — the tail semantics come from the reference's
``torch.nn.TransformerEncoderLayer`` post-LN chain
(/root/reference/src/modelling/models.py:42-81 via nn.TransformerEncoder),
as reproduced by models/layers.TransformerEncoderLayer's XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stlt_tpu.ops.fused_tail_train import (
    TAG_ATTN_DROP,
    TAG_MID_DROP,
    TAG_OUT_DROP,
    fused_layer_tail_train,
    hash_keep_rows,
    tail_train_fits,
)

H, FF = 32, 64


def _params(key, h=H, ff=FF):
    ks = jax.random.split(key, 8)
    return dict(
        n1s=1.0 + 0.1 * jax.random.normal(ks[0], (h,)),
        n1b=0.1 * jax.random.normal(ks[1], (h,)),
        w1=jax.random.normal(ks[2], (h, ff)) / np.sqrt(h),
        b1=0.1 * jax.random.normal(ks[3], (ff,)),
        w2=jax.random.normal(ks[4], (ff, h)) / np.sqrt(ff),
        b2=0.1 * jax.random.normal(ks[5], (h,)),
        n2s=1.0 + 0.1 * jax.random.normal(ks[6], (h,)),
        n2b=0.1 * jax.random.normal(ks[7], (h,)),
    )


def _chain(p, x, attn, *, eps, cdtype, activation, approx, rate, seed):
    """Mask-matched XLA mirror of the kernel math on [B, T, h]."""
    B, T, h = x.shape
    ff = p["w1"].shape[1]
    tokens = B * T
    xf = x.astype(cdtype).reshape(tokens, h)
    af = attn.astype(cdtype).reshape(tokens, h)
    if seed is not None and rate > 0.0:
        ds = 1.0 / (1.0 - rate)
        k1 = hash_keep_rows(seed, TAG_ATTN_DROP, tokens, h, rate)
        km = hash_keep_rows(seed, TAG_MID_DROP, tokens, ff, rate)
        k2 = hash_keep_rows(seed, TAG_OUT_DROP, tokens, h, rate)
        af = (af.astype(jnp.float32) * k1 * ds).astype(cdtype)
    r = xf + af
    r32 = r.astype(jnp.float32)
    mu = jnp.mean(r32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(r32 * r32, axis=-1, keepdims=True) - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    u32 = (r32 - mu) * rstd * p["n1s"].astype(jnp.float32) + p["n1b"].astype(
        jnp.float32
    )
    u = u32.astype(cdtype)
    z1 = jax.lax.dot_general(
        u, p["w1"].astype(cdtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + p["b1"].astype(jnp.float32)
    h1 = jax.nn.gelu(z1.astype(cdtype), approximate=approx) if (
        activation == "gelu"
    ) else jax.nn.relu(z1.astype(cdtype))
    if seed is not None and rate > 0.0:
        h1 = (h1.astype(jnp.float32) * km * ds).astype(cdtype)
    h2 = jax.lax.dot_general(
        h1, p["w2"].astype(cdtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + p["b2"].astype(jnp.float32)
    h2 = h2.astype(cdtype)
    if seed is not None and rate > 0.0:
        h2 = (h2.astype(jnp.float32) * k2 * ds).astype(cdtype)
    r2 = u + h2
    r232 = r2.astype(jnp.float32)
    mu2 = jnp.mean(r232, axis=-1, keepdims=True)
    var2 = jnp.maximum(
        0.0, jnp.mean(r232 * r232, axis=-1, keepdims=True) - mu2 * mu2
    )
    rstd2 = jax.lax.rsqrt(var2 + eps)
    y32 = (r232 - mu2) * rstd2 * p["n2s"].astype(jnp.float32) + p[
        "n2b"
    ].astype(jnp.float32)
    return y32.astype(cdtype).reshape(B, T, h)


def _fused(p, x, attn, *, eps, cdtype, activation, approx, rate, seed,
           tokens_live=None, rows_live=None):
    return fused_layer_tail_train(
        x, attn, p["n1s"], p["n1b"], p["w1"], p["b1"], p["w2"], p["b2"],
        p["n2s"], p["n2b"],
        eps=eps, compute_dtype=cdtype, activation=activation,
        gelu_approximate=approx, dropout_rate=rate, seed=seed,
        tokens_live=tokens_live, rows_live=rows_live,
    )


@pytest.mark.parametrize("rate,seeded", [(0.0, False), (0.25, True)])
def test_forward_matches_chain_f32(rate, seeded):
    key = jax.random.PRNGKey(0)
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, H))
    a = jax.random.normal(jax.random.PRNGKey(2), (3, 5, H))
    seed = jnp.uint32(1234) if seeded else None
    kw = dict(eps=1e-12, cdtype=jnp.float32, activation="gelu",
              approx=False, rate=rate, seed=seed)
    np.testing.assert_allclose(
        _fused(p, x, a, **kw), _chain(p, x, a, **kw), rtol=2e-5, atol=2e-5
    )


def test_forward_matches_chain_bf16():
    p = _params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, H))
    a = jax.random.normal(jax.random.PRNGKey(2), (4, 6, H))
    kw = dict(eps=1e-12, cdtype=jnp.bfloat16, activation="gelu",
              approx=True, rate=0.25, seed=jnp.uint32(77))
    got = np.asarray(_fused(p, x, a, **kw), np.float32)
    want = np.asarray(_chain(p, x, a, **kw), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_dropout_actually_drops_and_seeds_differ():
    p = _params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, H))
    a = jax.random.normal(jax.random.PRNGKey(2), (2, 4, H))
    kw = dict(eps=1e-12, cdtype=jnp.float32, activation="gelu",
              approx=False, rate=0.25)
    y0 = _fused(p, x, a, seed=None, **kw)
    y1 = _fused(p, x, a, seed=jnp.uint32(1), **kw)
    y2 = _fused(p, x, a, seed=jnp.uint32(2), **kw)
    assert not np.allclose(y0, y1)
    assert not np.allclose(y1, y2)
    # mask statistics: keep fraction near 1 - rate
    km = hash_keep_rows(jnp.uint32(5), TAG_MID_DROP, 512, FF, 0.25)
    assert abs(float(km.mean()) - 0.75) < 0.01


@pytest.mark.parametrize("rate,seeded", [(0.0, False), (0.25, True)])
def test_grads_match_chain_f32(rate, seeded):
    p = _params(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 5, H))
    a = jax.random.normal(jax.random.PRNGKey(5), (3, 5, H))
    w = jax.random.normal(jax.random.PRNGKey(6), (3, 5, H))
    seed = jnp.uint32(99) if seeded else None
    kw = dict(eps=1e-12, cdtype=jnp.float32, activation="gelu",
              approx=False, rate=rate, seed=seed)

    def loss_fused(p, x, a):
        return jnp.sum(_fused(p, x, a, **kw) * w)

    def loss_chain(p, x, a):
        return jnp.sum(_chain(p, x, a, **kw) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(p, x, a)
    gc = jax.grad(loss_chain, argnums=(0, 1, 2))(p, x, a)
    for name in p:
        np.testing.assert_allclose(
            gf[0][name], gc[0][name], rtol=2e-4, atol=2e-5,
            err_msg=f"param grad {name}",
        )
    np.testing.assert_allclose(gf[1], gc[1], rtol=2e-4, atol=2e-5,
                               err_msg="dx")
    np.testing.assert_allclose(gf[2], gc[2], rtol=2e-4, atol=2e-5,
                               err_msg="dattn")


def test_grads_match_chain_relu_multichunk():
    """FF chunking exercised (the tiny-FF picker keeps one chunk otherwise)
    + the relu activation path."""
    p = _params(jax.random.PRNGKey(7), h=H, ff=256)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 4, H))
    a = jax.random.normal(jax.random.PRNGKey(9), (2, 4, H))
    w = jax.random.normal(jax.random.PRNGKey(10), (2, 4, H))
    kw = dict(eps=1e-5, cdtype=jnp.float32, activation="relu",
              approx=False, rate=0.25, seed=jnp.uint32(4242))

    def loss_fused(p, x, a):
        return jnp.sum(_fused(p, x, a, **kw) * w)

    def loss_chain(p, x, a):
        return jnp.sum(_chain(p, x, a, **kw) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(p, x, a)
    gc = jax.grad(loss_chain, argnums=(0, 1, 2))(p, x, a)
    for name in p:
        np.testing.assert_allclose(
            gf[0][name], gc[0][name], rtol=5e-4, atol=5e-5,
            err_msg=f"param grad {name}",
        )
    np.testing.assert_allclose(gf[1], gc[1], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(gf[2], gc[2], rtol=5e-4, atol=5e-5)


def test_compaction_dead_tokens_zero_and_grads_exact():
    """Dead-token contract (pad-frame compaction): with a loss that only
    reads live tokens (the only consumers downstream — dead rows are
    -1e9-masked attention keys), outputs at dead tokens are zeros and every
    gradient matches the dense chain exactly."""
    B, T = 3, 16
    p = _params(jax.random.PRNGKey(11))
    x = jax.random.normal(jax.random.PRNGKey(12), (B, T, H))
    a = jax.random.normal(jax.random.PRNGKey(13), (B, T, H))
    lengths = jnp.array([16, 4, 8])
    tokens_live = jnp.arange(T)[None, :] < lengths[:, None]
    w = jax.random.normal(jax.random.PRNGKey(14), (B, T, H))
    w = w * tokens_live[..., None]  # masked loss: dead cotangents are zero
    kw = dict(eps=1e-12, cdtype=jnp.float32, activation="gelu",
              approx=False, rate=0.25, seed=jnp.uint32(31337))

    y = _fused(p, x, a, tokens_live=tokens_live, **kw)
    dead = np.asarray(~tokens_live)
    # skip granularity is 8-token GROUPS of the flattened token stream: a
    # group with any live token computes fully; fully-dead groups are zeros
    group_dead = ~np.asarray(tokens_live).reshape(-1, 8).any(axis=1)
    groups = np.asarray(y).reshape(-1, 8, H)
    assert group_dead.any()  # the fixture must exercise the skip
    assert np.all(groups[group_dead] == 0.0)

    def loss_fused(p, x, a):
        return jnp.sum(_fused(p, x, a, tokens_live=tokens_live, **kw) * w)

    def loss_chain(p, x, a):
        return jnp.sum(_chain(p, x, a, **kw) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(p, x, a)
    gc = jax.grad(loss_chain, argnums=(0, 1, 2))(p, x, a)
    for name in p:
        np.testing.assert_allclose(
            gf[0][name], gc[0][name], rtol=2e-4, atol=2e-5,
            err_msg=f"param grad {name}",
        )
    np.testing.assert_allclose(gf[1], gc[1], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(gf[2], gc[2], rtol=2e-4, atol=2e-5)
    # dead-token input grads are exactly zero (skipped blocks write zeros)
    assert np.all(np.asarray(gf[1])[dead] == 0.0)
    assert np.all(np.asarray(gf[2])[dead] == 0.0)


def test_rows_live_variant():
    """rows_live ([B] whole-row validity — the folded spatial stage)."""
    B, T = 6, 4
    p = _params(jax.random.PRNGKey(15))
    x = jax.random.normal(jax.random.PRNGKey(16), (B, T, H))
    a = jax.random.normal(jax.random.PRNGKey(17), (B, T, H))
    rows_live = jnp.array([1, 1, 0, 1, 0, 1], bool)
    kw = dict(eps=1e-12, cdtype=jnp.float32, activation="gelu",
              approx=False, rate=0.0, seed=None)
    y = _fused(p, x, a, rows_live=rows_live, **kw)
    want = _chain(p, x, a, **kw)
    live = np.asarray(rows_live)
    np.testing.assert_allclose(
        np.asarray(y)[live], np.asarray(want)[live], rtol=2e-5, atol=2e-5
    )
    assert np.all(np.asarray(y)[~live] == 0.0)


def test_fits_gate_reference_shapes():
    # headline spatial fold (B=512 x 17 frames, 8+pad tokens) and the
    # 512-frame temporal stage, bf16 and f32
    assert tail_train_fits(512 * 17, 8, 768, 3072, 2)
    assert tail_train_fits(32, 513, 768, 3072, 2)
    assert tail_train_fits(512 * 17, 8, 768, 3072, 4)


def test_jit_and_remat_compose():
    p = _params(jax.random.PRNGKey(18))
    x = jax.random.normal(jax.random.PRNGKey(19), (2, 4, H))
    a = jax.random.normal(jax.random.PRNGKey(20), (2, 4, H))
    kw = dict(eps=1e-12, cdtype=jnp.float32, activation="gelu",
              approx=False, rate=0.25, seed=jnp.uint32(5))

    @jax.jit
    def step(p, x, a):
        f = jax.checkpoint(lambda p, x, a: jnp.sum(_fused(p, x, a, **kw)))
        return jax.value_and_grad(f)(p, x, a)

    loss, grads = step(p, x, a)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
