"""Fused projection+attention kernel (ops/fused_encoder) vs the unfused chain.

The kernel fuses q/k/v projection, per-head attention, and the output
projection of ``MultiHeadAttention`` into one Pallas program (eval path).
Parity targets: the op matches the composed unfused math, the module's
pallas eval path matches the XLA path, the param tree is unchanged (so
checkpoint conversion is untouched), and the train/cross-attention paths
still work (they bypass the fused kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stlt_tpu.models.layers import MultiHeadAttention
from stlt_tpu.ops import masks
from stlt_tpu.ops.attention import dot_product_attention_reference
from stlt_tpu.ops.fused_encoder import fused_proj_attention


def _unfused(x, wqkv, bqkv, wo, bo, bias, num_heads, dtype):
    """The exact chain the module runs without the kernel."""
    H = x.shape[-1]
    D = H // num_heads
    dense = lambda a, w, b: (
        a.astype(dtype) @ w.astype(dtype) + b.astype(dtype)
    )
    B, T = x.shape[0], x.shape[1]
    q = dense(x, wqkv[:, :H], bqkv[:H]).reshape(B, T, num_heads, D)
    k = dense(x, wqkv[:, H:2 * H], bqkv[H:2 * H]).reshape(B, T, num_heads, D)
    v = dense(x, wqkv[:, 2 * H:], bqkv[2 * H:]).reshape(B, T, num_heads, D)
    out = dot_product_attention_reference(q, k, v, bias)
    return dense(out.reshape(B, T, H), wo, bo)


def _rand_op_inputs(rng, B, T, H, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(0, 1, (B, T, H)), dtype)
    wqkv = jnp.asarray(rng.normal(0, 0.05, (H, 3 * H)), jnp.float32)
    bqkv = jnp.asarray(rng.normal(0, 0.05, (3 * H,)), jnp.float32)
    wo = jnp.asarray(rng.normal(0, 0.05, (H, H)), jnp.float32)
    bo = jnp.asarray(rng.normal(0, 0.05, (H,)), jnp.float32)
    return x, wqkv, bqkv, wo, bo


@pytest.mark.parametrize(
    "B,T,H,N",
    [
        (12, 8, 64, 4),    # spatial boxes shape
        (5, 16, 64, 4),    # odd batch exercises row padding
        (4, 17, 64, 4),    # temporal length: token-padded to 24 in-launcher
        (3, 33, 32, 2),    # appearance length: token-padded to 40
    ],
)
def test_op_matches_unfused_chain(B, T, H, N):
    rng = np.random.default_rng(0)
    x, wqkv, bqkv, wo, bo = _rand_op_inputs(rng, B, T, H)
    pad = np.zeros((B, T), bool)
    pad[:, -2:] = True
    bias = masks.causal_bias(T) + masks.key_padding_bias(jnp.asarray(pad))
    got = fused_proj_attention(
        x, wqkv, bqkv, wo, bo, bias, num_heads=N, compute_dtype=jnp.float32
    )
    want = _unfused(x, wqkv, bqkv, wo, bo, bias, N, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_op_no_bias_and_forced_row_block():
    rng = np.random.default_rng(1)
    B, T, H, N = 7, 8, 32, 4
    x, wqkv, bqkv, wo, bo = _rand_op_inputs(rng, B, T, H)
    got = fused_proj_attention(
        x, wqkv, bqkv, wo, bo, None, num_heads=N, compute_dtype=jnp.float32,
        row_block=3,  # forces pad_rows=2
    )
    want = _unfused(x, wqkv, bqkv, wo, bo, None, N, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_op_bf16():
    rng = np.random.default_rng(2)
    B, T, H, N = 6, 8, 64, 4
    x, wqkv, bqkv, wo, bo = _rand_op_inputs(rng, B, T, H, jnp.bfloat16)
    got = fused_proj_attention(
        x, wqkv, bqkv, wo, bo, None, num_heads=N, compute_dtype=jnp.bfloat16
    )
    want = _unfused(
        x.astype(jnp.float32), wqkv, bqkv, wo, bo, None, N, jnp.float32
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.1, rtol=0.1
    )


def _mha_outputs(rng_key, use_pallas, *, deterministic=True, cross=False,
                 dropout_rate=0.0, T=8):
    H, N, B = 32, 4, 4
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (B, T, H)), jnp.float32)
    kv = jnp.asarray(rng.normal(0, 1, (B, 6, H)), jnp.float32) if cross else x
    pad = np.zeros((B, kv.shape[1]), bool)
    pad[:, -2:] = True
    bias = masks.key_padding_bias(jnp.asarray(pad))
    mha = MultiHeadAttention(
        hidden_size=H, num_heads=N, dropout_rate=dropout_rate,
        use_pallas=use_pallas,
    )
    params = mha.init(
        {"params": rng_key, "dropout": jax.random.PRNGKey(5)},
        x, kv, kv, bias, deterministic=deterministic,
    )["params"]
    out = mha.apply(
        {"params": params}, x, kv, kv, bias, deterministic=deterministic,
        rngs=None if deterministic else {"dropout": jax.random.PRNGKey(11)},
    )
    return params, np.asarray(out)


def test_module_fused_eval_matches_xla():
    key = jax.random.PRNGKey(0)
    _, fused = _mha_outputs(key, True)
    _, plain = _mha_outputs(key, False)
    np.testing.assert_allclose(fused, plain, atol=1e-5, rtol=1e-5)


def test_module_eval_path_actually_uses_fused_kernel():
    """Dispatch regression guard. When the fused-proj kernel is engaged
    (short-sequence eval, incl. non-multiples of 8 via token padding) the
    projections live INSIDE the pallas_call, so the jaxpr has no top-level
    dot_general; past FUSED_PROJ_MAX_SEQ the flash path keeps the four
    projection matmuls in XLA."""
    H, N, B = 32, 4, 4
    rng = np.random.default_rng(11)
    for T, expect_fused in ((8, True), (17, True), (72, False)):
        x = jnp.asarray(rng.normal(0, 1, (B, T, H)), jnp.float32)
        mha = MultiHeadAttention(hidden_size=H, num_heads=N, use_pallas=True)
        params = mha.init(jax.random.PRNGKey(0), x, x, x, None)["params"]
        jaxpr = jax.make_jaxpr(
            lambda p, a: mha.apply({"params": p}, a, a, a, None)
        )(params, x)

        def top_level_prims(jxp):
            for eqn in jxp.eqns:
                if eqn.primitive.name in ("pjit", "custom_vjp_call",
                                          "custom_vjp_call_jaxpr"):
                    inner = eqn.params.get("jaxpr") or eqn.params.get(
                        "call_jaxpr"
                    )
                    if inner is not None:
                        yield from top_level_prims(
                            getattr(inner, "jaxpr", inner)
                        )
                        continue
                yield eqn.primitive.name

        prims = list(top_level_prims(jaxpr.jaxpr))
        assert "pallas_call" in prims, (T, prims)
        n_dots = prims.count("dot_general")
        assert (n_dots == 0) == expect_fused, (T, n_dots)


def test_module_non_multiple_of_8_matches():
    """T=17 rides the fused kernel through the token-padding path (17 -> 24
    with -1e9 key bias) and must still match the XLA chain exactly."""
    key = jax.random.PRNGKey(9)
    _, fused = _mha_outputs(key, True, T=17)
    _, plain = _mha_outputs(key, False, T=17)
    np.testing.assert_allclose(fused, plain, atol=1e-5, rtol=1e-5)


def test_module_cross_attention_fused_matches():
    """Cross-attention (query != key/value) rides fused_cross_attention on
    eval — including the mixed T=8 / S=6 (padded to 8) shape — and must
    match the XLA chain."""
    key = jax.random.PRNGKey(1)
    _, fused = _mha_outputs(key, True, cross=True)
    _, plain = _mha_outputs(key, False, cross=True)
    np.testing.assert_allclose(fused, plain, atol=1e-5, rtol=1e-5)


def test_module_cross_attention_appearance_shape_matches():
    """The fusion models' real shape: 34 layout frames attending over 33
    appearance tokens (both pad in-launcher)."""
    H, N, B = 32, 4, 3
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.normal(0, 1, (B, 34, H)), jnp.float32)
    kv = jnp.asarray(rng.normal(0, 1, (B, 33, H)), jnp.float32)
    pad = np.zeros((B, 33), bool)
    pad[:, -5:] = True
    bias = masks.key_padding_bias(jnp.asarray(pad))
    outs = {}
    for use_pallas in (False, True):
        mha = MultiHeadAttention(hidden_size=H, num_heads=N,
                                 use_pallas=use_pallas)
        params = mha.init(jax.random.PRNGKey(2), x, kv, kv, bias)["params"]
        outs[use_pallas] = np.asarray(
            mha.apply({"params": params}, x, kv, kv, bias)
        )
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-5, rtol=1e-5)


def test_module_train_path_unchanged():
    """deterministic=False rides fused_proj_attention_train (in-kernel
    hashed dropout + custom backward) — outputs must still match the XLA
    fallback's hash-bit stream exactly."""
    key = jax.random.PRNGKey(2)
    _, fused = _mha_outputs(key, True, deterministic=False, dropout_rate=0.3)
    _, plain = _mha_outputs(key, False, deterministic=False, dropout_rate=0.3)
    np.testing.assert_allclose(fused, plain, atol=1e-5, rtol=1e-5)


def test_param_tree_unchanged():
    """The DenseParams refactor must keep the exact param paths the
    torch<->flax converter maps (q/k/v/out projections, kernel+bias)."""
    key = jax.random.PRNGKey(3)
    params, _ = _mha_outputs(key, True)
    assert sorted(params.keys()) == ["k_proj", "out_proj", "q_proj", "v_proj"]
    for name in params:
        assert sorted(params[name].keys()) == ["bias", "kernel"]
        assert params[name]["kernel"].shape == (32, 32)
        assert params[name]["bias"].shape == (32,)


def test_module_grad_through_train_path():
    """AD flows through the fused train path (custom_vjp backward) into
    every projection param with finite, nonzero gradients."""
    key = jax.random.PRNGKey(4)
    H, N, B, T = 32, 4, 2, 5
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (B, T, H)), jnp.float32)
    mha = MultiHeadAttention(hidden_size=H, num_heads=N, dropout_rate=0.1,
                             use_pallas=True)
    variables = mha.init(
        {"params": key, "dropout": jax.random.PRNGKey(6)},
        x, x, x, None, deterministic=False,
    )

    def loss(params):
        out = mha.apply(
            {"params": params}, x, x, x, None, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


# --- fused layer tail (residual+norm1 -> FFN -> residual+norm2) --------------


def _unfused_tail(x, y, n1s, n1b, w1, b1, w2, b2, n2s, n2b, eps, dtype,
                  activation):
    from stlt_tpu.models.layers import (
        activation_fn,
        apply_dense_params,
        apply_layer_norm,
    )

    u = apply_layer_norm(
        x.astype(dtype) + y.astype(dtype), n1s, n1b, eps, dtype
    )
    h = apply_dense_params(u, w1, b1, dtype)
    h = activation_fn(activation, dtype)(h)
    h = apply_dense_params(h, w2, b2, dtype)
    return apply_layer_norm(u + h, n2s, n2b, eps, dtype)


def _rand_tail_inputs(rng, B, T, H, FF, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(0, 1, (B, T, H)), dtype)
    y = jnp.asarray(rng.normal(0, 1, (B, T, H)), dtype)
    n1s = jnp.asarray(rng.normal(1, 0.1, (H,)), jnp.float32)
    n1b = jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (H, FF)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.05, (FF,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (FF, H)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.05, (H,)), jnp.float32)
    n2s = jnp.asarray(rng.normal(1, 0.1, (H,)), jnp.float32)
    n2b = jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.float32)
    return x, y, n1s, n1b, w1, b1, w2, b2, n2s, n2b


@pytest.mark.parametrize(
    "B,T,H,FF,activation",
    [
        (10, 8, 64, 256, "gelu"),    # spatial-like; erf GELU (f32 path)
        (5, 17, 64, 256, "gelu"),    # temporal length -> token-padded to 24
        (4, 33, 32, 128, "relu"),    # appearance length + ReLU
    ],
)
def test_tail_op_matches_unfused_chain(B, T, H, FF, activation):
    from stlt_tpu.ops.fused_encoder import fused_layer_tail

    rng = np.random.default_rng(21)
    args = _rand_tail_inputs(rng, B, T, H, FF)
    got = fused_layer_tail(
        *args, eps=1e-12, compute_dtype=jnp.float32, activation=activation,
        gelu_approximate=False,
    )
    want = _unfused_tail(*args, 1e-12, jnp.float32, activation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_tail_op_bf16():
    from stlt_tpu.ops.fused_encoder import fused_layer_tail

    rng = np.random.default_rng(22)
    args = _rand_tail_inputs(rng, 6, 8, 64, 256, jnp.float32)
    args = tuple(
        a.astype(jnp.bfloat16) if i < 2 else a for i, a in enumerate(args)
    )
    got = fused_layer_tail(
        *args, eps=1e-12, compute_dtype=jnp.bfloat16, activation="gelu",
        gelu_approximate=True,
    )
    assert got.dtype == jnp.bfloat16
    want = _unfused_tail(*args, 1e-12, jnp.float32, "gelu")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.15, rtol=0.1,
    )


def test_encoder_layer_eval_is_fully_fused():
    """Eval with use_pallas: the whole layer is two pallas_calls (attention
    sublayer + layer tail) with no top-level dot_general. TRAIN dispatch is
    gated on the model's clip length (round-5 hardware A/B: the fused train
    tail wins only in the HBM-bound long-context regime,
    ops/fused_tail_train.TAIL_TRAIN_MIN_FRAMES): a long-context layer is
    fully fused in train too; a short-context layer keeps the two XLA FFN
    GEMMs the MXU is faster at."""
    from stlt_tpu.models.layers import TransformerEncoderLayer

    H, B, T = 32, 4, 8
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.normal(0, 1, (B, T, H)), jnp.float32)

    def prims(deterministic, clip_frames):
        layer = TransformerEncoderLayer(
            hidden_size=H, num_heads=4, ff_size=4 * H, dropout_rate=0.1,
            activation="gelu", use_pallas=True, clip_frames=clip_frames,
        )
        params = layer.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, None, True,
        )["params"]
        jaxpr = jax.make_jaxpr(
            lambda p, a: layer.apply(
                {"params": p}, a, None, deterministic,
                rngs=None if deterministic else {"dropout": jax.random.PRNGKey(2)},
            )
        )(params, x)

        def walk(jxp):
            for eqn in jxp.eqns:
                if eqn.primitive.name in ("pjit", "custom_vjp_call",
                                          "custom_vjp_call_jaxpr"):
                    inner = eqn.params.get("jaxpr") or eqn.params.get(
                        "call_jaxpr"
                    )
                    if inner is not None:
                        yield from walk(getattr(inner, "jaxpr", inner))
                        continue
                yield eqn.primitive.name

        return list(walk(jaxpr.jaxpr))

    eval_prims = prims(True, 0)
    assert eval_prims.count("pallas_call") == 2, eval_prims
    assert eval_prims.count("dot_general") == 0, eval_prims
    # Long-context train forward: fused proj+attention + fused train tail,
    # no top-level XLA GEMM left.
    train_prims = prims(False, 512)
    assert train_prims.count("pallas_call") == 2, train_prims
    assert train_prims.count("dot_general") == 0, train_prims
    # Short-context train forward: attention kernel + the XLA tail chain
    # (linear1/linear2 dot_generals stay on the MXU-bound fast path).
    short_prims = prims(False, 0)
    assert short_prims.count("pallas_call") == 1, short_prims
    assert short_prims.count("dot_general") == 2, short_prims


def test_encoder_layer_eval_matches_xla_chain():
    from stlt_tpu.models.layers import TransformerEncoderLayer

    H, B = 48, 3
    rng = np.random.default_rng(24)
    for T in (8, 17):
        x = jnp.asarray(rng.normal(0, 1, (B, T, H)), jnp.float32)
        pad = np.zeros((B, T), bool)
        pad[:, -2:] = True
        bias = masks.key_padding_bias(jnp.asarray(pad))
        outs = {}
        for use_pallas in (False, True):
            layer = TransformerEncoderLayer(
                hidden_size=H, num_heads=4, ff_size=4 * H,
                activation="gelu", layer_norm_eps=1e-12,
                use_pallas=use_pallas,
            )
            params = layer.init(jax.random.PRNGKey(5), x, bias, True)["params"]
            outs[use_pallas] = np.asarray(
                layer.apply({"params": params}, x, bias, True)
            )
        np.testing.assert_allclose(
            outs[True], outs[False], atol=2e-5, rtol=1e-5
        )


# --- train path: fused forward + custom backward -----------------------------


def _train_ref(x, wqkv, bqkv, wo, bo, bias, seed, rate, num_heads, dtype):
    """Differentiable reference: unfused projections + XLA attention with
    the reconstructed hash keep mask (the exact bits the kernel uses)."""
    from stlt_tpu.ops.flash import hash_keep_mask

    H = x.shape[-1]
    D = H // num_heads
    B, T = x.shape[0], x.shape[1]
    dense = lambda a, w, b: a.astype(dtype) @ w.astype(dtype) + b.astype(dtype)
    q = dense(x, wqkv[:, :H], bqkv[:H]).reshape(B, T, num_heads, D)
    k = dense(x, wqkv[:, H:2 * H], bqkv[H:2 * H]).reshape(B, T, num_heads, D)
    v = dense(x, wqkv[:, 2 * H:], bqkv[2 * H:]).reshape(B, T, num_heads, D)
    mask = None
    if seed is not None and rate > 0:
        mask = hash_keep_mask(seed, B, num_heads, T, T, rate)
    out = dot_product_attention_reference(q, k, v, bias, mask, rate)
    return dense(out.reshape(B, T, H), wo, bo)


@pytest.mark.parametrize("T,rate", [(8, 0.25), (17, 0.25), (8, 0.0)])
def test_train_op_forward_and_grads_match_reference(T, rate):
    from stlt_tpu.ops.fused_encoder import fused_proj_attention_train

    rng = np.random.default_rng(31)
    B, H, N = 5, 64, 4
    x, wqkv, bqkv, wo, bo = _rand_op_inputs(rng, B, T, H)
    pad = np.zeros((B, T), bool)
    pad[:, -2:] = True
    bias = masks.causal_bias(T) + masks.key_padding_bias(jnp.asarray(pad))
    seed = jnp.uint32(1234) if rate > 0 else None

    def loss_fused(args):
        x_, wqkv_, bqkv_, wo_, bo_ = args
        y = fused_proj_attention_train(
            N, rate, x_, wqkv_, bqkv_, wo_, bo_, bias, seed
        )
        return jnp.sum(y * jnp.cos(y)), y

    def loss_ref(args):
        x_, wqkv_, bqkv_, wo_, bo_ = args
        y = _train_ref(x_, wqkv_, bqkv_, wo_, bo_, bias, seed, rate, N,
                       jnp.float32)
        return jnp.sum(y * jnp.cos(y)), y

    args = (x, wqkv, bqkv, wo, bo)
    (l1, y1), g1 = jax.value_and_grad(loss_fused, has_aux=True)(args)
    (l2, y2), g2 = jax.value_and_grad(loss_ref, has_aux=True)(args)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ["dx", "dwqkv", "dbqkv", "dwo", "dbo"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3, err_msg=name
        )


def test_module_train_grads_pallas_match_xla():
    """jax.grad through the full MHA train path: the fused custom backward
    must match XLA autodiff through the fallback chain (same dropout bits)."""
    H, N, B, T = 32, 4, 4, 8
    rng = np.random.default_rng(33)
    x = jnp.asarray(rng.normal(0, 1, (B, T, H)), jnp.float32)
    grads = {}
    for use_pallas in (False, True):
        mha = MultiHeadAttention(hidden_size=H, num_heads=N,
                                 dropout_rate=0.2, use_pallas=use_pallas)
        params = mha.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, x, x, None, deterministic=False,
        )["params"]

        def loss(p):
            out = mha.apply(
                {"params": p}, x, x, x, None, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(9)},
            )
            return jnp.sum(out ** 2)

        grads[use_pallas] = jax.grad(loss)(params)
    flat_t, _ = jax.tree_util.tree_flatten_with_path(grads[True])
    flat_f, _ = jax.tree_util.tree_flatten_with_path(grads[False])
    for (path, a), (_, b) in zip(flat_t, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=str(path),
        )


def test_train_op_dropout_zeroes_and_scales():
    """Statistical check on the fused train forward: with a huge positive
    v and uniform attention, dropout should zero ~rate of the (b,n,t)
    contributions and scale survivors by 1/(1-rate)."""
    from stlt_tpu.ops.fused_encoder import fused_proj_attention_train

    B, T, H, N = 16, 8, 32, 2
    rate = 0.5
    x = jnp.zeros((B, T, H), jnp.float32)
    wqkv = jnp.zeros((H, 3 * H), jnp.float32)
    bqkv = jnp.concatenate([jnp.zeros(2 * H), jnp.ones(H)])  # v == 1
    wo = jnp.eye(H, dtype=jnp.float32)
    bo = jnp.zeros((H,), jnp.float32)
    y = fused_proj_attention_train(
        N, rate, x, wqkv, bqkv, wo, bo, None, jnp.uint32(77)
    )
    # Uniform probs * keep/(1-rate): each output element is a mean of T
    # kept/dropped contributions scaled by 2 — overall mean must stay ~1.
    m = float(jnp.mean(y))
    assert 0.85 < m < 1.15, m
    # And some exact zeros should exist only if whole rows were dropped —
    # spot-check the value distribution is not degenerate.
    assert float(jnp.std(y)) > 0.05


def test_tail_op_multi_chunk_accumulator():
    """At real-model width (H=768, FF=3072) the picker splits the FF axis
    into chunks and the h2 accumulator/u-scratch logic engages — the sliced
    single-chunk small-shape tests never reach it."""
    from stlt_tpu.ops.fused_encoder import _pick_tail_blocks, fused_layer_tail

    rb, ffb = _pick_tail_blocks(2, 8, 768, 3072, 4)
    assert ffb < 3072, (rb, ffb)  # multi-chunk actually engaged
    rng = np.random.default_rng(41)
    args = _rand_tail_inputs(rng, 2, 8, 768, 3072)
    got = fused_layer_tail(
        *args, eps=1e-12, compute_dtype=jnp.float32, activation="gelu",
        gelu_approximate=False,
    )
    want = _unfused_tail(*args, 1e-12, jnp.float32, "gelu")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_train_op_bf16_grads_close_to_f32():
    """{bf16 x fused-train-backward}: the corner class where the round-2
    stem-conv bug hid. Grads of the bf16 fused path must track the f32
    reference within bf16 tolerance and be finite/nonzero."""
    from stlt_tpu.ops.fused_encoder import fused_proj_attention_train

    rng = np.random.default_rng(61)
    B, T, H, N, rate = 4, 8, 64, 4, 0.25
    x, wqkv, bqkv, wo, bo = _rand_op_inputs(rng, B, T, H)
    seed = jnp.uint32(99)

    def loss_bf16(args):
        x_, wqkv_, bqkv_, wo_, bo_ = args
        y = fused_proj_attention_train(
            N, rate, x_.astype(jnp.bfloat16), wqkv_, bqkv_, wo_, bo_,
            None, seed,
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_f32(args):
        x_, wqkv_, bqkv_, wo_, bo_ = args
        y = _train_ref(x_, wqkv_, bqkv_, wo_, bo_, None, seed, rate, N,
                       jnp.float32)
        return jnp.sum(y ** 2)

    args = (x, wqkv, bqkv, wo, bo)
    g16 = jax.grad(loss_bf16)(args)
    g32 = jax.grad(loss_f32)(args)
    for a, b, name in zip(g16, g32, ["dx", "dwqkv", "dbqkv", "dwo", "dbo"]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.isfinite(a).all(), name
        denom = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / denom < 0.08, (
            name, np.abs(a - b).max(), denom)


def test_module_h_too_big_falls_back():
    """H=1024 f32: the grid-resident weights alone exceed scoped VMEM, so
    fused_proj_fits must gate the kernels out and the XLA chain must run
    (previously rb walked down to 1 and would OOM only on hardware)."""
    from stlt_tpu.ops.fused_encoder import (
        fused_proj_fits,
        fused_train_fits,
    )

    assert not fused_proj_fits(64, 8, 1024, 16, 4)
    assert not fused_train_fits(64, 8, 1024, 16, 4)
    H, N, B, T = 1024, 16, 2, 8
    rng = np.random.default_rng(62)
    x = jnp.asarray(rng.normal(0, 1, (B, T, H)), jnp.float32)
    mha = MultiHeadAttention(hidden_size=H, num_heads=N, use_pallas=True)
    params = mha.init(jax.random.PRNGKey(0), x, x, x, None)["params"]
    jaxpr = jax.make_jaxpr(
        lambda p, a: mha.apply({"params": p}, a, a, a, None)
    )(params, x)
    assert "dot_general" in str(jaxpr.jaxpr)  # projections stayed in XLA
    out = mha.apply({"params": params}, x, x, x, None)
    assert np.isfinite(np.asarray(out)).all()


# --- pad-frame compaction (rows_live dead-block skipping) --------------------


def test_op_rows_live_matches_live_and_zeroes_dead():
    """Forced 2-row blocks: block {2,3} (rows 4..7) is fully dead — the
    kernel must skip it (writing zeros) while live rows match the no-live
    call bit for bit (live blocks run the identical code path)."""
    rng = np.random.default_rng(31)
    B, T, H, N = 8, 8, 32, 4
    x, wqkv, bqkv, wo, bo = _rand_op_inputs(rng, B, T, H)
    rows_live = jnp.asarray([True, True, True, False, False, False, False, True])
    got = fused_proj_attention(
        x, wqkv, bqkv, wo, bo, None, num_heads=N, compute_dtype=jnp.float32,
        row_block=2, rows_live=rows_live,
    )
    ref = fused_proj_attention(
        x, wqkv, bqkv, wo, bo, None, num_heads=N, compute_dtype=jnp.float32,
        row_block=2,
    )
    got, ref = np.asarray(got), np.asarray(ref)
    # blocks (1,2) = rows 2..5: rows 2 and 7 are in part-live blocks -> computed
    np.testing.assert_array_equal(got[:3], ref[:3])
    np.testing.assert_array_equal(got[7:], ref[7:])
    # rows 4..5 form a fully-dead block (rows 4,5) -> zeros; rows 3 shares a
    # block with live row 2, row 6 with live row 7 -> computed
    np.testing.assert_array_equal(got[4:6], np.zeros_like(got[4:6]))
    np.testing.assert_array_equal(got[3], ref[3])
    np.testing.assert_array_equal(got[6], ref[6])


def test_op_rows_live_all_dead_is_all_zero():
    rng = np.random.default_rng(32)
    B, T, H, N = 5, 8, 32, 4
    x, wqkv, bqkv, wo, bo = _rand_op_inputs(rng, B, T, H)
    got = fused_proj_attention(
        x, wqkv, bqkv, wo, bo, None, num_heads=N, compute_dtype=jnp.float32,
        row_block=2, rows_live=jnp.zeros(B, bool),
    )
    np.testing.assert_array_equal(np.asarray(got), np.zeros((B, T, H), np.float32))


def test_tail_rows_live_matches_live_and_zeroes_dead():
    from stlt_tpu.ops.fused_encoder import fused_layer_tail

    rng = np.random.default_rng(33)
    B, T, H, FF = 8, 8, 32, 128
    args = _rand_tail_inputs(rng, B, T, H, FF)
    rows_live = jnp.asarray([True] * 2 + [False] * 4 + [True] * 2)
    kw = dict(eps=1e-12, compute_dtype=jnp.float32, activation="gelu",
              gelu_approximate=False, blocks=(2, FF // 2))
    got = np.asarray(fused_layer_tail(*args, rows_live=rows_live, **kw))
    ref = np.asarray(fused_layer_tail(*args, **kw))
    np.testing.assert_array_equal(got[:2], ref[:2])
    np.testing.assert_array_equal(got[6:], ref[6:])
    np.testing.assert_array_equal(got[2:6], np.zeros_like(got[2:6]))


@pytest.mark.parametrize("rate", [0.0, 0.25])
def test_train_op_rows_live_grads_match_zero_dead_cotangent(rate):
    """Compaction backward: with cotangents that are zero on dead rows (the
    model invariant — dead rows' downstream consumers are -1e9-masked
    attention keys), grads with rows_live match the uncompacted op, and
    dx on dead rows is exactly zero."""
    from stlt_tpu.ops.fused_encoder import fused_proj_attention_train

    rng = np.random.default_rng(34)
    B, T, H, N = 8, 8, 32, 4
    x, wqkv, bqkv, wo, bo = _rand_op_inputs(rng, B, T, H)
    rows_live = jnp.asarray([True, True, False, False, False, False, True, True])
    g_up = jnp.asarray(rng.normal(0, 1, (B, T, H)), jnp.float32)
    g_up = g_up * rows_live[:, None, None]  # zero cotangent on dead rows
    seed = jnp.uint32(9) if rate else None

    def run(live):
        def f(x, wqkv, bqkv, wo, bo):
            y = fused_proj_attention_train(
                N, rate, x, wqkv, bqkv, wo, bo, None, seed, live
            )
            return jnp.sum(y * g_up)

        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4))(
            x, wqkv, bqkv, wo, bo
        )
        return val, grads

    val_c, grads_c = run(rows_live)
    val_p, grads_p = run(None)
    # loss sums y*g over LIVE rows only (g dead = 0) -> identical
    np.testing.assert_allclose(float(val_c), float(val_p), rtol=1e-6)
    names = ["dx", "dwqkv", "dbqkv", "dwo", "dbo"]
    for name, a, b in zip(names, grads_c, grads_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4, err_msg=name
        )
    # dead-row dx is exactly zero on the compacted path
    dx = np.asarray(grads_c[0])
    np.testing.assert_array_equal(dx[2:6], np.zeros_like(dx[2:6]))


def test_model_ragged_compaction_matches_xla(monkeypatch):
    """Whole-model invariant: ragged clips (tail-contiguous pad frames per
    the dataset collaters) produce identical logits and grads with the
    compacted pallas path and the plain XLA path — pad-frame spatial rows
    are dead downstream, so zeroing them is exact. The long-context gate is
    forced open so the 12-frame test model still exercises the fused train
    tail's mixed live/dead blocks."""
    import dataclasses

    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory
    from stlt_tpu.training.criterion import make_criterion
    import stlt_tpu.ops.fused_tail_train as ftt

    monkeypatch.setattr(ftt, "TAIL_TRAIN_MIN_FRAMES", 0)

    cfgp = StltModelConfig(
        num_classes=7, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
        use_pallas=True,
    )
    cfgx = dataclasses.replace(cfgp, use_pallas=False)
    batch = _synthetic_layout_batch(4, 12, 5, 4, seed=1, length_range=(3, 12))
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    mp = models_factory["stlt"](cfgp)
    mx = models_factory["stlt"](cfgx)
    params = mp.init(jax.random.PRNGKey(0), inputs)["params"]
    lp = mp.apply({"params": params}, inputs)["stlt"]
    lx = mx.apply({"params": params}, inputs)["stlt"]
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(lx), atol=2e-5, rtol=1e-5
    )

    crit = make_criterion("something")
    labels = jnp.asarray(batch["labels"] % 7)
    key = jax.random.key(3, impl="rbg")

    def loss(m, p):
        lo = m.apply(
            {"params": p}, inputs, deterministic=False, rngs={"dropout": key}
        )
        return crit(lo, labels, None)

    gp = jax.grad(lambda p: loss(mp, p))(params)
    gx = jax.grad(lambda p: loss(mx, p))(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gp)[0],
        jax.tree_util.tree_flatten_with_path(gx)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
            err_msg=str(pa),
        )


def test_model_ragged_blockwise_compaction_matches_xla():
    """Ragged parity at a BLOCKWISE temporal length (>=513 frames): dead-q
    block skipping in the blockwise kernels + the token-flattened fused tail
    (which now serves long context) + spatial compaction, all against the
    plain XLA path. Eval logits and train grads."""
    import dataclasses

    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory
    from stlt_tpu.training.criterion import make_criterion

    cfgp = StltModelConfig(
        num_classes=5, unique_categories=4, hidden_size=32,
        num_attention_heads=4, num_spatial_layers=1, num_temporal_layers=1,
        layout_num_frames=516, use_pallas=True,
    )
    cfgx = dataclasses.replace(cfgp, use_pallas=False)
    batch = _synthetic_layout_batch(2, 516, 3, 4, seed=2, length_range=(40, 200))
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    mp = models_factory["stlt"](cfgp)
    mx = models_factory["stlt"](cfgx)
    params = mp.init(jax.random.PRNGKey(0), inputs)["params"]
    lp = mp.apply({"params": params}, inputs)["stlt"]
    lx = mx.apply({"params": params}, inputs)["stlt"]
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(lx), atol=5e-5, rtol=1e-4
    )

    crit = make_criterion("something")
    labels = jnp.asarray(batch["labels"] % 5)
    key = jax.random.key(3, impl="rbg")

    def loss(m, p):
        lo = m.apply(
            {"params": p}, inputs, deterministic=False, rngs={"dropout": key}
        )
        return crit(lo, labels, None)

    gp = jax.grad(lambda p: loss(mp, p))(params)
    gx = jax.grad(lambda p: loss(mx, p))(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gp)[0],
        jax.tree_util.tree_flatten_with_path(gx)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
            err_msg=str(pa),
        )
