"""Pallas fused-attention kernel vs the XLA reference (interpret mode on CPU).

Covers the model's three attention shapes (spatial boxes, temporal causal,
cross-attention), masked inputs including all-padded-key rows, bf16 inputs,
and gradient flow through the custom_vjp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stlt_tpu.ops import masks
from stlt_tpu.ops.attention import dot_product_attention_reference
from stlt_tpu.ops.flash import flash_attention


def _rand_qkv(rng, B, T, S, N, D, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(0, 1, (B, T, N, D)), dtype)
    k = jnp.asarray(rng.normal(0, 1, (B, S, N, D)), dtype)
    v = jnp.asarray(rng.normal(0, 1, (B, S, N, D)), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "B,T,S,N,D",
    [
        (6, 8, 8, 4, 16),     # spatial boxes shape
        (4, 17, 17, 4, 32),   # temporal frames shape
        (2, 17, 33, 4, 16),   # cross-attention layout←appearance
    ],
)
def test_kernel_matches_reference(B, T, S, N, D):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, B, T, S, N, D)
    got = flash_attention(q, k, v)
    want = dot_product_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_kernel_with_causal_and_padding_bias():
    rng = np.random.default_rng(1)
    B, T, N, D = 3, 9, 4, 16
    q, k, v = _rand_qkv(rng, B, T, T, N, D)
    pad = np.zeros((B, T), bool)
    pad[:, -3:] = True  # last frames padded
    bias = masks.causal_bias(T) + masks.key_padding_bias(jnp.asarray(pad))
    got = flash_attention(q, k, v, bias)
    want = dot_product_attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_kernel_fully_masked_row_is_finite():
    """A fully-masked key row must degrade to uniform attention, not NaN."""
    rng = np.random.default_rng(2)
    B, T, N, D = 2, 4, 2, 8
    q, k, v = _rand_qkv(rng, B, T, T, N, D)
    pad = np.ones((B, T), bool)  # everything masked
    bias = masks.key_padding_bias(jnp.asarray(pad))
    got = np.asarray(flash_attention(q, k, v, bias))
    assert np.isfinite(got).all()


def test_kernel_bf16():
    rng = np.random.default_rng(3)
    B, T, N, D = 2, 8, 4, 16
    q, k, v = _rand_qkv(rng, B, T, T, N, D, dtype=jnp.bfloat16)
    got = np.asarray(flash_attention(q, k, v)).astype(np.float32)
    want = np.asarray(dot_product_attention_reference(q, k, v)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_gradients_flow_and_match_reference():
    rng = np.random.default_rng(4)
    B, T, N, D = 2, 6, 2, 8
    q, k, v = _rand_qkv(rng, B, T, T, N, D)
    bias = masks.causal_bias(T)

    def loss_kernel(q, k, v):
        return flash_attention(q, k, v, bias).sum()

    def loss_ref(q, k, v):
        return dot_product_attention_reference(q, k, v, bias).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_model_with_pallas_flag_matches():
    """End-to-end: STLT logits with use_pallas=True equal the XLA path."""
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory
    from __graft_entry__ import _synthetic_layout_batch

    batch = _synthetic_layout_batch(4, 6, 4, 4, seed=9)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    outs = {}
    for use_pallas in (False, True):
        cfg = StltModelConfig(
            num_classes=7, unique_categories=4, hidden_size=32,
            num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
            use_pallas=use_pallas,
        )
        model = models_factory["stlt"](cfg)
        params = model.init(jax.random.PRNGKey(0), inputs)["params"]
        outs[use_pallas] = np.asarray(model.apply({"params": params}, inputs)["stlt"])
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-5, rtol=1e-5)


def test_bf16_pallas_predictions_match_f32():
    """The serving config (bf16 + pallas + tanh-GELU) must produce logits
    close to the f32 exact path — argmax agreement on a realistic-width
    model is what eval parity rests on."""
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory
    from __graft_entry__ import _synthetic_layout_batch

    batch = _synthetic_layout_batch(8, 9, 6, 4, seed=13)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    outs = {}
    for dtype, pallas in (("float32", False), ("bfloat16", True)):
        cfg = StltModelConfig(
            num_classes=32, unique_categories=4, hidden_size=64,
            num_attention_heads=4, num_spatial_layers=2, num_temporal_layers=2,
            compute_dtype=dtype, use_pallas=pallas,
        )
        model = models_factory["stlt"](cfg)
        params = model.init(jax.random.PRNGKey(3), inputs)["params"]
        outs[dtype] = np.asarray(model.apply({"params": params}, inputs)["stlt"])
    np.testing.assert_array_equal(
        outs["float32"].argmax(-1), outs["bfloat16"].argmax(-1)
    )
    np.testing.assert_allclose(outs["float32"], outs["bfloat16"], atol=0.15, rtol=0.1)


def test_remat_outputs_and_grads_match():
    """Activation rematerialization must be numerically invisible."""
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory
    from __graft_entry__ import _synthetic_layout_batch

    batch = _synthetic_layout_batch(4, 6, 4, 4, seed=1)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    outs, grads = {}, {}
    for remat in (False, True):
        cfg = StltModelConfig(
            num_classes=7, unique_categories=4, hidden_size=32,
            num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
            remat=remat, hidden_dropout_prob=0.0,
        )
        model = models_factory["stlt"](cfg)
        params = model.init(jax.random.PRNGKey(0), inputs)["params"]
        outs[remat] = np.asarray(model.apply({"params": params}, inputs)["stlt"])
        grads[remat] = jax.grad(
            lambda p: model.apply({"params": p}, inputs)["stlt"].sum()
        )(params)
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        grads[True], grads[False],
    )


# --- blockwise (KV-loop) long-context kernel --------------------------------


def _blockwise_direct(q, k, v, bias=None):
    """Invoke the KV-loop kernel regardless of the dispatch threshold."""
    from stlt_tpu.ops.flash import _blockwise_forward

    B, T, N, D = q.shape
    S = k.shape[1]
    if bias is None:
        bias = jnp.zeros((1, 1, T, S), jnp.float32)
    while bias.ndim < 4:
        bias = bias[None]
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (B, bias.shape[1], T, S))
    out, _lse = _blockwise_forward(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        bias,
    )
    return out.transpose(0, 2, 1, 3)


@pytest.mark.parametrize(
    "B,T,S,N,D",
    [
        (2, 512, 512, 2, 32),   # VERDICT #3 done-when: T=S>=512
        (2, 257, 257, 2, 32),   # 256 frames + extract — prime length (padding path)
        (1, 130, 384, 2, 16),   # rectangular, non-multiple of the block
    ],
)
def test_blockwise_kernel_matches_reference(B, T, S, N, D):
    rng = np.random.default_rng(5)
    q, k, v = _rand_qkv(rng, B, T, S, N, D)
    got = _blockwise_direct(q, k, v)
    want = dot_product_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_blockwise_kernel_causal_padding_bias():
    rng = np.random.default_rng(6)
    B, T, N, D = 2, 300, 2, 16
    q, k, v = _rand_qkv(rng, B, T, T, N, D)
    pad = np.zeros((B, T), bool)
    pad[:, -50:] = True
    bias = masks.causal_bias(T) + masks.key_padding_bias(jnp.asarray(pad))
    got = _blockwise_direct(q, k, v, bias)
    want = dot_product_attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_blockwise_kernel_bf16_and_dispatched_grads():
    rng = np.random.default_rng(7)
    B, T, N, D = 1, 256, 2, 16
    q, k, v = _rand_qkv(rng, B, T, T, N, D, dtype=jnp.bfloat16)
    got = np.asarray(_blockwise_direct(q, k, v)).astype(np.float32)
    want = np.asarray(dot_product_attention_reference(q, k, v)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)

    # gradients through the public entry at a blockwise-dispatched length
    # (this exercises the KV-loop Pallas BACKWARD kernels, not XLA recompute)
    T = 520
    qf, kf, vf = _rand_qkv(rng, 1, T, T, 1, 8)
    bias = masks.causal_bias(T)
    gk = jax.grad(lambda a, b, c: flash_attention(a, b, c, bias).sum(), (0, 1, 2))(qf, kf, vf)
    gr = jax.grad(
        lambda a, b, c: dot_product_attention_reference(a, b, c, bias).sum(), (0, 1, 2)
    )(qf, kf, vf)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_blockwise_backward_rectangular_and_weighted_cotangent():
    """Non-square blockwise-dispatched shape with a non-uniform upstream
    cotangent (catches dq/dk/dv cross-wiring a .sum() cotangent cannot)."""
    rng = np.random.default_rng(11)
    B, T, S, N, D = 2, 130, 640, 2, 16
    q, k, v = _rand_qkv(rng, B, T, S, N, D)
    pad = np.zeros((B, S), bool)
    pad[:, -37:] = True
    bias = masks.key_padding_bias(jnp.asarray(pad))
    w = jnp.asarray(rng.normal(size=(B, T, N, D)).astype(np.float32))

    def loss_k(a, b, c):
        return (flash_attention(a, b, c, bias) * w).sum()

    def loss_r(a, b, c):
        return (dot_product_attention_reference(a, b, c, bias) * w).sum()

    gk = jax.grad(loss_k, (0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, (0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


# --- fused attention-probability dropout (train path) ------------------------


@pytest.mark.parametrize("T,S", [(9, 9), (17, 33), (257, 257), (520, 520)])
def test_dropout_mask_kernel_matches_reference(T, S):
    """Same keep-mask through the Pallas kernel and the XLA path, fwd + grad."""
    rng = np.random.default_rng(8)
    B, N, D, rate = 2, 2, 16, 0.25
    q, k, v = _rand_qkv(rng, B, T, S, N, D)
    keep = jnp.asarray(rng.random((B, N, T, S)) > rate, jnp.float32)
    bias = masks.causal_bias(T) if T == S else None

    def f_kernel(q, k, v):
        return flash_attention(q, k, v, bias, dropout_mask=keep, dropout_rate=rate)

    def f_ref(q, k, v):
        return dot_product_attention_reference(q, k, v, bias, keep, rate)

    np.testing.assert_allclose(
        np.asarray(f_kernel(q, k, v)), np.asarray(f_ref(q, k, v)),
        atol=2e-5, rtol=1e-4,
    )
    gk = jax.grad(lambda *a: f_kernel(*a).sum(), (0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: f_ref(*a).sum(), (0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_train_mode_pallas_matches_xla_exactly(monkeypatch):
    """With the mask sampled outside the kernel (attention) and the tail's
    three dropout streams counter-hashed identically on both paths, the
    train-mode forward under use_pallas must EQUAL the XLA path given the
    same dropout rng. The long-context gate is forced open so the 6-frame
    test model dispatches the fused train tail."""
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory
    from __graft_entry__ import _synthetic_layout_batch
    import stlt_tpu.ops.fused_tail_train as ftt

    monkeypatch.setattr(ftt, "TAIL_TRAIN_MIN_FRAMES", 0)

    batch = _synthetic_layout_batch(4, 6, 4, 4, seed=21)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    outs = {}
    for use_pallas in (False, True):
        cfg = StltModelConfig(
            num_classes=7, unique_categories=4, hidden_size=32,
            num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
            hidden_dropout_prob=0.2, use_pallas=use_pallas,
        )
        model = models_factory["stlt"](cfg)
        params = model.init(jax.random.PRNGKey(0), inputs)["params"]
        outs[use_pallas] = np.asarray(
            model.apply(
                {"params": params}, inputs,
                deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)},
            )["stlt"]
        )
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-5, rtol=1e-5)


# --- in-kernel hashed dropout (long-context train path) ----------------------


@pytest.mark.parametrize("T,S", [(48, 48), (520, 520), (130, 640)])
def test_hashed_dropout_matches_reconstructed_mask(T, S):
    """dropout_seed path: the kernel hashes keep bits in place; the XLA
    reference fed hash_keep_mask's reconstruction must match bit-for-bit,
    forward and gradients (the backward kernels REGENERATE the same bits)."""
    from stlt_tpu.ops.flash import hash_keep_mask

    rng = np.random.default_rng(13)
    B, N, D, rate = 2, 2, 16, 0.25
    q, k, v = _rand_qkv(rng, B, T, S, N, D)
    bias = masks.causal_bias(T) if T == S else None
    seed = jnp.uint32(0xABCD1234)
    keep = hash_keep_mask(seed, B, N, T, S, rate)

    def f_kernel(q, k, v):
        return flash_attention(q, k, v, bias, dropout_seed=seed, dropout_rate=rate)

    def f_ref(q, k, v):
        return dot_product_attention_reference(q, k, v, bias, keep, rate)

    np.testing.assert_allclose(
        np.asarray(f_kernel(q, k, v)), np.asarray(f_ref(q, k, v)),
        atol=2e-5, rtol=1e-4,
    )
    gk = jax.grad(lambda *a: f_kernel(*a).sum(), (0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: f_ref(*a).sum(), (0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_hashed_dropout_keep_rate_and_decorrelation():
    """Statistical properties of the counter hash: keep rate within ~3 sigma
    of 1-rate, different seeds/heads give (near-)independent bits."""
    from stlt_tpu.ops.flash import hash_keep_mask

    B, N, T, S, rate = 2, 4, 64, 64, 0.3
    m1 = np.asarray(hash_keep_mask(jnp.uint32(1), B, N, T, S, rate))
    m2 = np.asarray(hash_keep_mask(jnp.uint32(2), B, N, T, S, rate))
    n = m1.size
    sigma = (rate * (1 - rate) / n) ** 0.5
    assert abs(m1.mean() - (1 - rate)) < 4 * sigma, m1.mean()
    assert abs(m2.mean() - (1 - rate)) < 4 * sigma, m2.mean()
    # seeds decorrelate: agreement ~= p^2 + (1-p)^2 for p = keep rate
    agree = (m1 == m2).mean()
    expected = (1 - rate) ** 2 + rate ** 2
    assert abs(agree - expected) < 0.02, agree
    # heads decorrelate within one seed
    agree_heads = (m1[:, 0] == m1[:, 1]).mean()
    assert abs(agree_heads - expected) < 0.02, agree_heads
    # and the bits are a deterministic function of the seed
    m1b = np.asarray(hash_keep_mask(jnp.uint32(1), B, N, T, S, rate))
    np.testing.assert_array_equal(m1, m1b)


def test_model_long_context_train_forward_finite():
    """STLT train-mode forward at a blockwise-dispatched clip length routes
    dropout through the in-kernel seed path (no [B,N,T,S] mask) and stays
    finite."""
    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory

    batch = _synthetic_layout_batch(2, 513, 4, 4, seed=5)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    cfg = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=2, num_spatial_layers=1, num_temporal_layers=1,
        layout_num_frames=513, hidden_dropout_prob=0.2, use_pallas=True,
    )
    model = models_factory["stlt"](cfg)
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    out = model.apply(
        {"params": params}, inputs,
        deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)},
    )["stlt"]
    assert np.isfinite(np.asarray(out)).all()


# --- causal block skipping (long-context fast path) --------------------------


@pytest.mark.parametrize("T", [520, 640])
def test_causal_skip_matches_unskipped(T):
    """causal=True skips above-diagonal blocks; outputs and gradients must
    EQUAL the unskipped kernel and the XLA reference (the skipped blocks'
    p is identically 0), including with key padding and hashed dropout."""
    from stlt_tpu.ops.flash import hash_keep_mask

    rng = np.random.default_rng(17)
    B, N, D, rate = 2, 2, 16, 0.2
    q, k, v = _rand_qkv(rng, B, T, T, N, D)
    pad = np.zeros((B, T), bool)
    pad[:, -41:] = True
    bias = masks.causal_bias(T) + masks.key_padding_bias(jnp.asarray(pad))

    got = flash_attention(q, k, v, bias, causal=True)
    base = flash_attention(q, k, v, bias, causal=False)
    want = dot_product_attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    # gradients (exercises the skip in both backward kernels), dropout on
    seed = jnp.uint32(99)
    keep = hash_keep_mask(seed, B, N, T, T, rate)

    def loss_skip(a, b, c):
        return flash_attention(
            a, b, c, bias, dropout_seed=seed, dropout_rate=rate, causal=True
        ).sum()

    def loss_ref(a, b, c):
        return dot_product_attention_reference(a, b, c, bias, keep, rate).sum()

    gk = jax.grad(loss_skip, (0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


# --- in-kernel lengths-generated bias (no O(T^2) bias buffer) ----------------


@pytest.mark.parametrize("T,causal", [(640, True), (640, False), (48, True)])
def test_kv_lengths_matches_dense_bias(T, causal):
    """kv_lengths (+ causal) must equal the dense-bias path exactly on LIVE
    query rows — forward and gradients, blockwise and short dispatch, with
    hashed dropout. Dead rows (t >= length) follow the documented lengths-
    mode row contract: unspecified-but-finite forward values (zeros on the
    blockwise dispatch, which SKIPS whole dead q blocks) and zero-cotangent
    backward — so the loss masks dead rows, as the models do (the loss reads
    only the extract row, which is live)."""
    rng = np.random.default_rng(23)
    B, N, D, rate = 2, 2, 16, 0.2
    q, k, v = _rand_qkv(rng, B, T, T, N, D)
    # clip 0's dead tail is long enough to cover whole q blocks on the
    # blockwise dispatch (ragged-clip realism), plus a ragged 37-row edge.
    cut = T - 300 if T >= 640 else T - 37
    lengths = jnp.asarray([cut, T], jnp.int32)
    row_live = (np.arange(T)[None, :] < np.asarray(lengths)[:, None])
    row_live = jnp.asarray(row_live)[:, :, None, None]  # [B, T, 1, 1]
    pad = np.zeros((B, T), bool)
    pad[0, cut:] = True
    bias = masks.key_padding_bias(jnp.asarray(pad))
    if causal:
        bias = bias + masks.causal_bias(T)
    seed = jnp.uint32(0xC0FFEE)

    def f_len(a, b, c):
        return flash_attention(
            a, b, c, dropout_seed=seed, dropout_rate=rate,
            causal=causal, kv_lengths=lengths,
        )

    def f_dense(a, b, c):
        return flash_attention(
            a, b, c, bias, dropout_seed=seed, dropout_rate=rate, causal=causal
        )

    out_len, out_dense = f_len(q, k, v), f_dense(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_len * row_live), np.asarray(out_dense * row_live),
        atol=1e-6, rtol=1e-6,
    )
    assert np.all(np.isfinite(np.asarray(out_len)))
    if T >= 640:
        # blockwise dispatch: whole dead q blocks are skipped and zeroed
        # (the 300-row dead tail covers at least the last 128-row q block)
        tb = np.asarray(out_len[0, T - 128:])
        np.testing.assert_array_equal(tb, np.zeros_like(tb))
    gl = jax.grad(lambda *a: (f_len(*a) * row_live).sum(), (0, 1, 2))(q, k, v)
    gd = jax.grad(lambda *a: (f_dense(*a) * row_live).sum(), (0, 1, 2))(q, k, v)
    for a, b in zip(gl, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


def test_model_long_context_uses_lengths_bias():
    """STLT at a blockwise length routes the temporal bias through
    kv_lengths: the dense [B, 1, F, F] bias must be DCE'd — NOTHING with two
    sequence-sized axes (i.e. O(F²)-shaped) survives anywhere in the eval
    jaxpr. (Plain size thresholds don't work: legit O(F) activations like
    the spatial FFN's [B·F, O, 4H] can rival the bias in element count.)"""
    from tests.test_long_context_memory import _max_quadratic_size
    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory

    B, F = 2, 513
    batch = _synthetic_layout_batch(B, F, 4, 4, seed=5)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    cfg = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
        layout_num_frames=F, use_pallas=True,
    )
    model = models_factory["stlt"](cfg)
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    quad = _max_quadratic_size(
        lambda p, x: model.apply({"params": p}, x), F, params, inputs
    )
    assert quad == 0, quad
    # Sanity: the same scan DOES see the bias when kv_lengths is disabled
    # (use_pallas=False keeps the dense-bias path).
    cfg_dense = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
        layout_num_frames=F, use_pallas=False,
    )
    model_d = models_factory["stlt"](cfg_dense)
    quad_d = _max_quadratic_size(
        lambda p, x: model_d.apply({"params": p}, x), F, params, inputs
    )
    assert quad_d >= B * (F + 1) * (F + 1), quad_d
