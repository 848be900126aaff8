"""Real-TPU A/B validation for the fused-encoder kernel family.

Round-3 landed two default-ON kernels (``fused_layer_tail``,
``fused_proj_attention_train``) and the fused cross-attention variant with
CPU-interpreter parity only — the relay to the real chip went down before
they were ever lowered by Mosaic (VERDICT r3 gap #1).  This tool runs each
dispatch on the REAL chip, kernels-ON vs kernels-OFF, and compares outputs:

    python tools/ab_fused_hw.py              # all three cases
    python tools/ab_fused_hw.py --case stlt_eval

The kill-switches (``STLT_FUSED_PROJ/TAIL/PROJ_TRAIN``,
``stlt_tpu/ops/fused_encoder.py:67-69``) are read once at import, so each
variant runs in its own subprocess; the parent compares the saved outputs
and prints one JSON verdict line per case.  Tolerances are the model-level
bf16 ones from tests/test_fused_encoder.py (atol/rtol 0.1 on logits; grad
NORMS at 2% — CPU tests already prove bit-level parity, this checks Mosaic
lowering + sane numerics on hardware).

Reference workload shapes: H=768, 12 heads, 4+8 layers, 17x8 layout tokens
(/root/reference/src/utils/parser.py:91-132).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

# `python tools/ab_fused_hw.py` puts tools/ (not the repo root) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = (
    "stlt_eval", "stlt_eval_ragged", "stlt_train", "stlt_train_ragged",
    "stlt_train_nodrop", "cacnf_eval", "stlt_eval_live_prefix",
    "stlt_train_live_prefix", "stlt_eval_frame_cap", "stlt_train_frame_cap",
)

# env deltas per variant: "on" is the shipping kernel set with the
# tail-train frame gate forced open (the A/B models are 17/129-frame, below
# the ≥256 long-context gate in ops/fused_tail_train.TAIL_TRAIN_MIN_FRAMES —
# correctness validation must still exercise the kernel), "off" routes every
# fused-encoder dispatch back to the plain XLA paths — including the round-4
# fused TRAIN tail and pad-frame compaction, so the train cases really
# compare the new kernels against the clean XLA chain (the off chain
# reconstructs the same hashed dropout streams, so train grads are
# comparable bit-stream-for-bit-stream).
VARIANTS = {
    "on": {"STLT_TAIL_TRAIN_MIN_FRAMES": "0"},
    "off": {
        "STLT_FUSED_PROJ": "0",
        "STLT_FUSED_TAIL": "0",
        "STLT_FUSED_PROJ_TRAIN": "0",
        "STLT_FUSED_TAIL_TRAIN": "0",
        "STLT_COMPACTION": "0",
        "STLT_LIVE_PREFIX": "0",
        "STLT_FRAME_CAP": "0",
    },
}


def _stlt_model(layout_num_frames=None, dropout=None, live_capacity=None,
                frame_capacity=None):
    from stlt_tpu.configs import StltModelConfig
    from stlt_tpu.models import models_factory

    kw = {}
    if layout_num_frames is not None:
        kw["layout_num_frames"] = layout_num_frames
    if dropout is not None:
        kw["hidden_dropout_prob"] = dropout
    if live_capacity is not None:
        kw["spatial_live_capacity"] = live_capacity
    if frame_capacity is not None:
        kw["temporal_frame_capacity"] = frame_capacity
    config = StltModelConfig(
        num_classes=174, unique_categories=4, hidden_size=768,
        num_attention_heads=12, num_spatial_layers=4, num_temporal_layers=8,
        compute_dtype="bfloat16", use_pallas=True, **kw,
    )
    return models_factory["stlt"](config)


def _cacnf_model():
    from stlt_tpu.configs import MultimodalModelConfig
    from stlt_tpu.models import models_factory

    config = MultimodalModelConfig(
        num_classes=174, unique_categories=4, hidden_size=768,
        num_attention_heads=12, num_spatial_layers=4, num_temporal_layers=8,
        num_appearance_layers=4, num_fusion_layers=4, appearance_num_frames=32,
        resnet_model_path="unused", compute_dtype="bfloat16", use_pallas=True,
    )
    return models_factory["cacnf"](config)


def run_case(case: str, out_path: str) -> None:
    import jax
    import numpy as np

    from __graft_entry__ import _synthetic_layout_batch

    save = {}
    if case in ("stlt_eval", "stlt_eval_ragged", "stlt_eval_live_prefix",
                "stlt_eval_frame_cap"):
        ragged = case != "stlt_eval"
        bs = 16 if ragged else 64
        # ragged: 257-frame clips at SSv2-like fill (~40-60 real frames) —
        # whole spatial row blocks are dead, exercising the pad-frame-
        # compaction skip (pl.when + SMEM live flags) under real Mosaic
        # lowering; the model logits must be invariant (dead rows never
        # reach them).
        batch = _synthetic_layout_batch(
            bs, 257 if ragged else 17, 8, 4,
            length_range=(20, 64) if ragged else None,
        )
        # live_prefix: the "on" variant additionally runs the spatial fold
        # at a static live-row capacity (gather -> small grid -> scatter,
        # models/stlt.py); "off" is the plain XLA chain, so the check is
        # end-to-end: permutation + capacity + kernels vs no kernels at all.
        # Capacity keys off COMPACTION_ENABLED because the off variant's env
        # (STLT_COMPACTION=0) reaches this subprocess at import time.
        cap = fcap = None
        if case == "stlt_eval_live_prefix":
            from stlt_tpu.ops.fused_encoder import (
                COMPACTION_ENABLED, live_prefix_capacity,
            )

            if COMPACTION_ENABLED:
                ft = np.asarray(batch["frame_types"])
                cap = live_prefix_capacity(int((ft != 0).sum()), int(ft.size))
        elif case == "stlt_eval_frame_cap":
            # frame_cap: BOTH ragged levers composed exactly as the CLIs'
            # --live_prefix ships them — truncate the frame axis to the
            # batch's longest live prefix, then fold the spatial stage to a
            # live-row capacity of the truncated axis. Both helpers self-gate
            # on their env kills, so the "off" subprocess (STLT_FRAME_CAP=0,
            # STLT_LIVE_PREFIX=0) gets the plain XLA chain.
            from stlt_tpu.ops.fused_encoder import (
                frame_capacity, live_prefix_capacity,
            )

            ft = np.asarray(batch["frame_types"])
            live_per_clip = (ft != 0).sum(axis=1)
            fcap = frame_capacity(int(live_per_clip.max()), ft.shape[1])
            cap = live_prefix_capacity(
                int(live_per_clip.sum()),
                ft.shape[0] * (fcap or ft.shape[1]),
            )
        model = _stlt_model(
            layout_num_frames=257 if ragged else None, live_capacity=cap,
            frame_capacity=fcap,
        )
        inputs = jax.device_put(
            {k: v for k, v in batch.items() if k != "labels"}
        )
        params = jax.device_put(model.init(jax.random.PRNGKey(0), inputs)["params"])
        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)["stlt"])
        t0 = time.perf_counter()
        logits = np.asarray(fwd(params, inputs))
        save["compile_s"] = np.float64(time.perf_counter() - t0)
        save["logits"] = logits.astype(np.float32)
    elif case == "cacnf_eval":
        model = _cacnf_model()
        bs = 16
        rng = np.random.default_rng(0)
        batch = _synthetic_layout_batch(bs, 17, 8, 4)
        batch["video_frames"] = rng.normal(0, 1, (bs, 32, 112, 112, 3)).astype(
            np.float32
        )
        inputs = jax.device_put(
            {k: v for k, v in batch.items() if k != "labels"}
        )
        params = jax.device_put(model.init(jax.random.PRNGKey(0), inputs)["params"])
        fwd = jax.jit(
            lambda p, x: {h: v for h, v in model.apply({"params": p}, x).items()}
        )
        t0 = time.perf_counter()
        outs = jax.tree.map(np.asarray, fwd(params, inputs))
        save["compile_s"] = np.float64(time.perf_counter() - t0)
        for head, v in outs.items():
            save[f"logits_{head}"] = v.astype(np.float32)
    elif case in ("stlt_train", "stlt_train_ragged", "stlt_train_nodrop",
                  "stlt_train_live_prefix", "stlt_train_frame_cap"):
        from stlt_tpu.training.criterion import make_criterion

        ragged = case in (
            "stlt_train_ragged", "stlt_train_live_prefix",
            "stlt_train_frame_cap",
        )
        # ragged: 129-frame clips at SSv2-like fill — mixed live/dead row
        # blocks hit the fused train tail's per-token dead contract and the
        # attention kernels' dead-q-block skip under real Mosaic lowering;
        # grads must match the XLA chain (same hashed dropout streams).
        # nodrop: dropout_rate=0 removes the bit-stream question entirely —
        # any residual on/off grad delta is pure bf16 accumulation-order
        # noise, the measured basis for the loose signed-sum bar below.
        criterion = make_criterion("something")
        bs = 8 if ragged else 64
        batch = _synthetic_layout_batch(
            bs, 129 if ragged else 17, 8, 4,
            length_range=(20, 64) if ragged else None,
        )
        # live_prefix train: dropout=0 because the hashed streams index by
        # operand row, which the live-prefix gather permutes — with dropout
        # off the capacity path's grads must match the XLA chain on the
        # compaction contract alone.
        cap = fcap = None
        if case == "stlt_train_live_prefix":
            from stlt_tpu.ops.fused_encoder import (
                COMPACTION_ENABLED, live_prefix_capacity,
            )

            if COMPACTION_ENABLED:
                ft = np.asarray(batch["frame_types"])
                cap = live_prefix_capacity(int((ft != 0).sum()), int(ft.size))
        elif case == "stlt_train_frame_cap":
            # composed ragged levers, dropout=0 (truncation changes operand
            # shapes, so dropout bit-streams on/off differ by design — the
            # check is the truncation + fold contract itself)
            from stlt_tpu.ops.fused_encoder import (
                frame_capacity, live_prefix_capacity,
            )

            ft = np.asarray(batch["frame_types"])
            live_per_clip = (ft != 0).sum(axis=1)
            fcap = frame_capacity(int(live_per_clip.max()), ft.shape[1])
            cap = live_prefix_capacity(
                int(live_per_clip.sum()),
                ft.shape[0] * (fcap or ft.shape[1]),
            )
        model = _stlt_model(
            layout_num_frames=129 if ragged else None,
            dropout=0.0
            if case in ("stlt_train_nodrop", "stlt_train_live_prefix",
                        "stlt_train_frame_cap")
            else None,
            live_capacity=cap,
            frame_capacity=fcap,
        )
        labels = jax.device_put(batch["labels"].astype(np.int32))
        inputs = jax.device_put(
            {k: v for k, v in batch.items() if k != "labels"}
        )
        params = jax.device_put(model.init(jax.random.PRNGKey(0), inputs)["params"])
        rng = jax.random.key(7, impl="rbg")

        def loss_fn(p):
            logits = model.apply(
                {"params": p}, inputs, deterministic=False,
                rngs={"dropout": rng},
            )
            return criterion(logits, labels, None)

        step = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.perf_counter()
        loss, grads = step(params)
        loss = float(loss)
        save["compile_s"] = np.float64(time.perf_counter() - t0)
        save["loss"] = np.float64(loss)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            leaf = np.asarray(leaf, np.float64)
            save[f"gnorm:{name}"] = np.float64(np.linalg.norm(leaf))
            save[f"gsum:{name}"] = np.float64(leaf.sum())
    else:
        raise ValueError(case)
    np.savez(out_path, **save)


def compare(case: str, on_path: str, off_path: str) -> dict:
    import numpy as np

    on = np.load(on_path)
    off = np.load(off_path)
    result = {"case": case, "ok": True, "checks": {}}
    # Global gradient scale: denominators are floored by a fraction of it so
    # ANALYTICALLY-ZERO leaves don't fail on rounding residue. (k_proj/bias
    # is exactly such a leaf: a constant shift of every key leaves softmax
    # invariant and softmax-backward rows sum to zero, so dbk's ~1e-5 "norm"
    # is pure cancellation noise.)
    gscale = max(
        [float(off[k]) for k in off.files if k.startswith("gnorm:")],
        default=1.0,
    )
    for key in on.files:
        if key == "compile_s":
            result["compile_s_on"] = round(float(on[key]), 1)
            result["compile_s_off"] = round(float(off[key]), 1)
            continue
        a, b = np.asarray(on[key], np.float64), np.asarray(off[key], np.float64)
        if key.startswith("gsum:"):
            # A signed sum over millions of entries cancels toward zero —
            # relative-to-itself explodes on noise. Scale by the leaf's grad
            # NORM instead (cancellation-aware); bf16 backward accumulation
            # differs between the kernels, so the bar is loose. Calibrated on
            # hardware (round 5): with dropout_rate=0 — no bit-stream question
            # at all — the worst leaf measured 0.071 (stlt_train_nodrop,
            # /tmp/q5b 2026-08-19), pure accumulation-order noise; with the
            # 1/0.9 dropout scaling the same leaves reached 0.166 while every
            # norm matched to <=0.13% and losses to 1.2e-4. Bar = 0.25.
            denom = max(float(off["gnorm:" + key[5:]]), 1e-3 * gscale)
            rel = float(abs(a - b).max() / denom)
            ok = rel < 0.25
            result["checks"][key] = round(rel, 6)
        elif key.startswith("gnorm:"):
            denom = max(abs(b).max(), 1e-3 * gscale)
            rel = float(abs(a - b).max() / denom)
            ok = rel < 2e-2
            result["checks"][key] = round(rel, 6)
        else:
            maxdiff = float(abs(a - b).max())
            scale = max(float(abs(b).max()), 1e-6)
            ok = maxdiff < 0.1 + 0.1 * scale
            result["checks"][f"maxdiff:{key}"] = round(maxdiff, 6)
        result["ok"] = result["ok"] and ok
    # keep the verdict line small: only report the worst few checks
    worst = sorted(result["checks"].items(), key=lambda kv: -kv[1])[:6]
    result["checks"] = dict(worst)
    return result


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--case", choices=[*CASES, "all"], default="all")
    parser.add_argument("--run-child", help=argparse.SUPPRESS)
    parser.add_argument("--out", help=argparse.SUPPRESS)
    args = parser.parse_args()

    if args.run_child:
        from stlt_tpu.utils.jax_setup import enable_compilation_cache

        enable_compilation_cache()
        run_case(args.run_child, args.out)
        return

    cases = list(CASES) if args.case == "all" else [args.case]
    any_bad = False
    tmp = os.environ.get("AB_OUT_DIR")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        ctx = None
    else:
        ctx = tempfile.TemporaryDirectory()
        tmp = ctx.name
    try:
        for case in cases:
            paths = {}
            for variant, env_delta in VARIANTS.items():
                out = os.path.join(tmp, f"{case}_{variant}.npz")
                env = {**os.environ, **env_delta}
                proc = subprocess.run(
                    [sys.executable, __file__, "--run-child", case, "--out", out],
                    env=env, capture_output=True, text=True, timeout=5400,
                )
                if proc.returncode != 0:
                    print(json.dumps({
                        "case": case, "variant": variant, "ok": False,
                        "error": proc.stderr[-2000:],
                    }), flush=True)
                    paths = None
                    any_bad = True
                    break
                paths[variant] = out
            if paths:
                verdict = compare(case, paths["on"], paths["off"])
                any_bad = any_bad or not verdict["ok"]
                print(json.dumps(verdict), flush=True)
    finally:
        if ctx is not None:
            ctx.cleanup()
    sys.exit(1 if any_bad else 0)


if __name__ == "__main__":
    main()
