"""Throughput benchmark: STLT layout-clips/sec on one chip.

Workload = the reference's defining config (SURVEY.md §6): STLT with hidden
768, 12 heads, 4 spatial + 8 temporal layers, 16 layout frames (+ extract),
8 box tokens/frame, 174 classes — eval forward (the serving path), bf16
compute, batch-size sweep. North star: ≥5k layout-clips/sec/chip on TPU v5e
(BASELINE.json). vs_baseline = clips_per_sec / 5000.

Measurement note: this environment reaches the TPU through a relay where
``block_until_ready`` returns before the device finishes, and a host fetch
costs ~70ms RTT. So we time a *dependency-chained* scan of K forwards inside
ONE jit call (the chain defeats CSE/hoisting; each iteration perturbs the
input by a function of the previous output), fetch one scalar, and report
(t(K) - t(1)) / (K - 1) per forward. Calibration: the same method measures a
4096³ bf16 matmul at ~193 TFLOP/s — v5e peak — so the timing is sound.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _synthetic_layout_batch
from stlt_tpu.configs import StltModelConfig
from stlt_tpu.models import models_factory

NORTH_STAR = 5000.0  # clips/sec/chip


def chained_forward_time(model, params, batch_size, chain_len, config_key=0):
    """Seconds for ONE jit call running `chain_len` dependency-chained
    forwards; returns wall time after the result scalar is on the host."""
    batch = _synthetic_layout_batch(batch_size, 17, 8, 4, seed=config_key)
    inputs = {k: v for k, v in batch.items() if k != "labels"}
    inputs = jax.device_put(inputs)

    @jax.jit
    def run(params, inputs):
        def body(carry, _):
            # tiny carry-dependent perturbation → true sequential dependency
            perturbed = dict(inputs)
            perturbed["boxes"] = inputs["boxes"] + (carry * 1e-20).astype(
                inputs["boxes"].dtype
            )
            out = model.apply({"params": params}, perturbed)["stlt"]
            return jnp.tanh(out.sum()), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=chain_len)
        return carry

    _ = np.asarray(run(params, inputs))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(run(params, inputs))
    return time.perf_counter() - t0


def bench_batch_size(model, params, batch_size, chain_len=32):
    t1 = chained_forward_time(model, params, batch_size, 1)
    tk = chained_forward_time(model, params, batch_size, chain_len)
    per_forward = max((tk - t1) / (chain_len - 1), 1e-9)
    return batch_size / per_forward


def main():
    config = StltModelConfig(
        num_classes=174,
        unique_categories=4,
        hidden_size=768,
        num_attention_heads=12,
        num_spatial_layers=4,
        num_temporal_layers=8,
        compute_dtype="bfloat16",
    )
    model = models_factory["stlt"](config)
    init_batch = _synthetic_layout_batch(8, 17, 8, 4)
    params = model.init(
        jax.random.PRNGKey(0), {k: v for k, v in init_batch.items() if k != "labels"}
    )["params"]
    params = jax.device_put(params)

    best, best_bs = 0.0, 0
    for bs in (256, 512, 1024):
        rate = bench_batch_size(model, params, bs)
        if rate > best:
            best, best_bs = rate, bs
    print(
        json.dumps(
            {
                "metric": f"stlt_eval_clips_per_sec_chip (bf16, batch {best_bs})",
                "value": round(best, 1),
                "unit": "clips/sec/chip",
                "vs_baseline": round(best / NORTH_STAR, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
