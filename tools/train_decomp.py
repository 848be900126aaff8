"""Train-step speed-of-light decomposition (VERDICT r3 #4).

Round 2 produced the eval decomposition (PERF_NOTES: 48% model-level MFU is
the honest ceiling for 8-token rows); this is the TRAIN analogue at the
reference workload (B=512, H=768, 12 heads, 4+8 layers, 17x8 tokens,
dropout on, bf16+pallas — /root/reference/src/utils/parser.py:91-132).

    python tools/train_decomp.py --stage all        # the whole table
    python tools/train_decomp.py --stage full       # one row

Stages:
  full        jitted donated train step (fwd + bwd + clip + AdamW)
  grads       value_and_grad only                -> optimizer = full - grads
  fwd         loss only (same dropout rngs)      -> backward  = grads - fwd
  spatial2    grads with 2 spatial layers        -> per-spatial-layer fwd+bwd
  temporal4   grads with 4 temporal layers       -> per-temporal-layer fwd+bwd
  attn        spatial-shape MHA sublayer fwd+bwd microbench
  ffn         spatial-shape FFN chain  fwd+bwd microbench
  dwqkv       the x^T.dy projection-weight GEMM triple alone (the piece the
              fused train kernel leaves to XLA)

All rows use the dispatch-chain timing from bench.py (the relay returns from
block_until_ready early; fetching one scalar off the LAST output bounds the
chain; long-minus-short cancels RTT).  Run on an IDLE host.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BS = 512
FRAMES, BOXES, CATS = 17, 8, 4
H, N_HEADS, FF = 768, 12, 3072


def _config(spatial=4, temporal=8):
    from stlt_tpu.configs import StltModelConfig

    return StltModelConfig(
        num_classes=174, unique_categories=CATS, hidden_size=H,
        num_attention_heads=N_HEADS, num_spatial_layers=spatial,
        num_temporal_layers=temporal, compute_dtype="bfloat16",
        use_pallas=True,
    )


def _setup(spatial=4, temporal=8):
    from __graft_entry__ import _synthetic_layout_batch
    from stlt_tpu.models import models_factory

    model = models_factory["stlt"](_config(spatial, temporal))
    batch = _synthetic_layout_batch(BS, FRAMES, BOXES, CATS)
    labels = jax.device_put(batch["labels"].astype(np.int32))
    inputs = jax.device_put({k: v for k, v in batch.items() if k != "labels"})
    params = jax.device_put(model.init(jax.random.PRNGKey(0), inputs)["params"])
    return model, params, inputs, labels


def _chain(fn, *args, n_short=2, n_long=12, reps=3, donate_state=None):
    """Per-call seconds via the long-minus-short dispatch chain."""
    if donate_state is None:
        out = fn(*args)
        jax.tree.map(np.asarray, out)  # compile + warm fetch

        def timed(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[-1]
            _ = np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[-1:])
            return time.perf_counter() - t0
    else:
        state = donate_state
        # donated step: state threads through; fetch the loss each time
        state, loss = fn(state, *args)  # compile + warm fetch
        _ = np.asarray(loss)

        def timed(n):
            nonlocal state
            t0 = time.perf_counter()
            loss = None
            for _ in range(n):
                state, loss = fn(state, *args)
            _ = np.asarray(loss)
            return time.perf_counter() - t0

    timed(1)
    t_short = min(timed(n_short) for _ in range(reps))
    t_long = min(timed(n_long) for _ in range(reps))
    return max((t_long - t_short) / (n_long - n_short), 1e-9)


def stage_full():
    from stlt_tpu.training.criterion import make_criterion
    from stlt_tpu.training.loop import create_train_state, make_train_step
    from stlt_tpu.training.optimizer import make_optimizer

    model, params, inputs, labels = _setup()
    batch = dict(inputs)
    batch["labels"] = labels
    tx = make_optimizer(
        params, learning_rate=1e-4, weight_decay=1e-3, clip_val=5.0,
        num_warmup_steps=100, num_training_steps=1000,
    )
    state = jax.device_put(create_train_state(params, tx))
    step = jax.jit(
        make_train_step(model, tx, make_criterion("something")),
        donate_argnums=(0,),
    )
    seed = np.uint32(1)
    per = _chain(step, batch, seed, donate_state=state)
    return per


def _grads_fn(model, labels, with_grad=True):
    from stlt_tpu.training.criterion import make_criterion

    criterion = make_criterion("something")
    rng = jax.random.key(7, impl="rbg")

    def loss_fn(params, inputs):
        logits = model.apply(
            {"params": params}, inputs, deterministic=False,
            rngs={"dropout": rng},
        )
        return criterion(logits, labels, None)

    if not with_grad:
        return jax.jit(loss_fn)

    def value_and_gradsum(params, inputs):
        loss, grads = jax.value_and_grad(loss_fn)(params, inputs)
        # Return the grad reduction as a real output so the backward cannot
        # be DCE'd (0.0 * gsum could legally fold away); one reduction over
        # params is negligible.
        gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return loss, gsum

    return jax.jit(value_and_gradsum)


def stage_grads(spatial=4, temporal=8):
    model, params, inputs, labels = _setup(spatial, temporal)
    fn = _grads_fn(model, labels, with_grad=True)
    return _chain(fn, params, inputs)


def stage_fwd():
    model, params, inputs, labels = _setup()
    fn = _grads_fn(model, labels, with_grad=False)
    return _chain(fn, params, inputs)


# ---- sublayer microbenches at the spatial-stage shape -------------------
# Spatial stage at train: [B*FRAMES, BOXES, H] = [8704, 8, 768] bf16.

SPATIAL_ROWS = BS * FRAMES


def _sublayer_setup():
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.normal(0, 1, (SPATIAL_ROWS, BOXES, H)).astype(jnp.bfloat16)
    )
    return x


def stage_attn():
    from stlt_tpu.models.layers import MultiHeadAttention

    x = _sublayer_setup()
    mha = MultiHeadAttention(
        hidden_size=H, num_heads=N_HEADS, dropout_rate=0.1,
        dtype=jnp.bfloat16, use_pallas=True,
    )
    params = mha.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, x, x, None, deterministic=False,
    )["params"]
    params = jax.device_put(params)
    rng = jax.random.key(7, impl="rbg")

    def loss(p, x):
        out = mha.apply(
            {"params": p}, x, x, x, None, deterministic=False,
            rngs={"dropout": rng},
        )
        return jnp.sum(out.astype(jnp.float32))

    def vg(p, x):
        l, gx = jax.value_and_grad(loss, argnums=1)(p, x)
        return l, jnp.sum(gx.astype(jnp.float32))

    return _chain(jax.jit(vg), params, x)


def stage_ffn():
    """The layer tail exactly as the train path runs it (layers.py:468-481):
    dropout + add&LN1 + linear1 + gelu + dropout + linear2 + dropout +
    add&LN2, fwd+bwd."""
    from stlt_tpu.models.layers import activation_fn, apply_layer_norm

    x = _sublayer_setup()
    attn_out = _sublayer_setup()
    rng = np.random.default_rng(1)
    w1 = jax.device_put(rng.normal(0, 0.02, (H, FF)).astype(np.float32))
    b1 = jax.device_put(np.zeros(FF, np.float32))
    w2 = jax.device_put(rng.normal(0, 0.02, (FF, H)).astype(np.float32))
    b2 = jax.device_put(np.zeros(H, np.float32))
    sc = jax.device_put(np.ones(H, np.float32))
    bi = jax.device_put(np.zeros(H, np.float32))
    key = jax.random.key(7, impl="rbg")

    def tail(w1, b1, w2, b2, x, attn_out):
        k1, k2, k3 = jax.random.split(key, 3)
        keep = 0.9
        a = attn_out * jax.random.bernoulli(k1, keep, attn_out.shape) / keep
        u = apply_layer_norm(x + a, sc, bi, 1e-12, jnp.bfloat16)
        h = (u @ w1.astype(jnp.bfloat16)) + b1.astype(jnp.bfloat16)
        h = activation_fn("gelu", jnp.bfloat16)(h)
        h = h * jax.random.bernoulli(k2, keep, h.shape) / keep
        h = (h @ w2.astype(jnp.bfloat16)) + b2.astype(jnp.bfloat16)
        h = h * jax.random.bernoulli(k3, keep, h.shape) / keep
        y = apply_layer_norm(u + h, sc, bi, 1e-12, jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    def vg(w1, b1, w2, b2, x, attn_out):
        l, gs = jax.value_and_grad(tail, argnums=(0, 1, 2, 3))(
            w1, b1, w2, b2, x, attn_out
        )
        return l, sum(jnp.sum(g) for g in gs)

    return _chain(jax.jit(vg), w1, b1, w2, b2, x, attn_out)


def stage_dwqkv():
    """The three projection-weight grad GEMMs the fused train kernel leaves
    to XLA: dWqkv = x^T dqkv ([tokens, H]^T [tokens, 3H]), dx = dqkv Wqkv^T,
    plus dbqkv."""
    rng = np.random.default_rng(2)
    tokens = SPATIAL_ROWS * BOXES
    x = jax.device_put(rng.normal(0, 1, (tokens, H)).astype(jnp.bfloat16))
    dqkv = jax.device_put(rng.normal(0, 1, (tokens, 3 * H)).astype(jnp.bfloat16))
    wqkv = jax.device_put(rng.normal(0, 0.02, (H, 3 * H)).astype(jnp.bfloat16))

    def f(x, dqkv, wqkv):
        dw = x.T @ dqkv
        dx = dqkv @ wqkv.T
        db = dqkv.sum(0)
        return (
            jnp.sum(dw.astype(jnp.float32))
            + jnp.sum(dx.astype(jnp.float32))
            + jnp.sum(db.astype(jnp.float32))
        )

    return _chain(jax.jit(f), x, dqkv, wqkv)


STAGES = {
    "full": stage_full,
    "grads": stage_grads,
    "fwd": stage_fwd,
    "spatial2": partial(stage_grads, spatial=2),
    "temporal4": partial(stage_grads, temporal=4),
    "attn": stage_attn,
    "ffn": stage_ffn,
    "dwqkv": stage_dwqkv,
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--stage", default="all", choices=[*STAGES, "all"])
    args = parser.parse_args()
    from stlt_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    names = list(STAGES) if args.stage == "all" else [args.stage]
    results = {}
    for name in names:
        try:
            per = STAGES[name]()
            results[name] = per
            print(json.dumps({
                "stage": name, "ms": round(per * 1e3, 2),
                "clips_per_sec": round(BS / per, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc(file=sys.stderr)
            print(json.dumps({"stage": name, "error": repr(e)}), flush=True)

    if {"full", "grads", "fwd"} <= results.keys():
        derived = {
            "optimizer_ms": round((results["full"] - results["grads"]) * 1e3, 2),
            "backward_ms": round((results["grads"] - results["fwd"]) * 1e3, 2),
            "forward_ms": round(results["fwd"] * 1e3, 2),
        }
        if "spatial2" in results:
            derived["per_spatial_layer_ms"] = round(
                (results["grads"] - results["spatial2"]) / 2 * 1e3, 2
            )
        if "temporal4" in results:
            derived["per_temporal_layer_ms"] = round(
                (results["grads"] - results["temporal4"]) / 4 * 1e3, 2
            )
        print(json.dumps({"stage": "derived", **derived}), flush=True)


if __name__ == "__main__":
    main()
