"""Multi-host runtime tests (SURVEY.md §2.6 mesh row: DCN/multi-slice).

The headline test launches the REAL train CLI as two OS processes over the
distributed CPU backend (gloo collectives, 4 virtual devices each = 8 global)
and asserts the per-epoch losses and the exported best checkpoint match a
single-process 8-device run bit-for-bit-modulo-reduction-order: the loader
materializes per-process rows of the same global batch stream, so the math is
the same — only the collective implementation differs.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest
from flax import serialization

from tests.fixtures import make_something_fixture


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _cli_args(paths, tmpdir, tag, **extra):
    args = {
        "dataset_name": "something",
        "dataset_type": "layout",
        "model_name": "stlt",
        "train_dataset_path": paths["dataset_path"],
        "val_dataset_path": paths["dataset_path"],
        "labels_path": paths["labels_path"],
        "videoid2size_path": paths["videoid2size_path"],
        "layout_num_frames": "8",
        "batch_size": "8",
        "epochs": "2",
        "warmup_epochs": "1",
        "hidden_size": "32",
        "num_attention_heads": "4",
        "num_spatial_layers": "1",
        "num_temporal_layers": "1",
        "learning_rate": "1e-3",
        "model_parallel": "2",
        "platform": "cpu",
        "save_model_path": os.path.join(tmpdir, f"best_{tag}.msgpack"),
        "log_filepath": os.path.join(tmpdir, f"train_{tag}.log"),
    }
    args.update(extra)
    argv = []
    for k, v in args.items():
        argv += [f"--{k}", str(v)]
    return argv, args


def _run(argv, devices, check=True, timeout=420):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    proc = subprocess.run(
        [sys.executable, "-m", "stlt_tpu.train", *argv],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    if check and proc.returncode != 0:
        raise AssertionError(
            f"train CLI failed ({proc.returncode}):\n{proc.stdout}\n{proc.stderr}"
        )
    return proc


def _losses(log_path):
    pattern = re.compile(r"train loss ([0-9.]+)")
    with open(log_path) as f:
        return [float(m.group(1)) for m in map(pattern.search, f) if m]


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    tmpdir = str(tmp_path)
    paths, *_ = make_something_fixture(tmpdir, num_videos=8, seed=5)

    # Single-process, 8 virtual devices.
    argv_single, args_single = _cli_args(paths, tmpdir, "single")
    _run(argv_single, devices=8)
    single_losses = _losses(args_single["log_filepath"])
    assert len(single_losses) == 2

    # Two processes x 4 virtual devices = the same 8-device (4 data x 2
    # model) mesh, gloo collectives across processes.
    port = _free_port()
    argv_multi, args_multi = _cli_args(
        paths, tmpdir, "multi",
        coordinator_address=f"localhost:{port}", num_processes="2",
    )
    p0 = subprocess.Popen(
        [sys.executable, "-m", "stlt_tpu.train", *argv_multi, "--process_id", "0"],
        cwd="/root/repo",
        env={**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    p1 = subprocess.Popen(
        [sys.executable, "-m", "stlt_tpu.train", *argv_multi, "--process_id", "1"],
        cwd="/root/repo",
        env={**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    out0, err0 = p0.communicate(timeout=420)
    out1, err1 = p1.communicate(timeout=60)
    assert p0.returncode == 0, f"proc0 failed:\n{out0}\n{err0}"
    assert p1.returncode == 0, f"proc1 failed:\n{out1}\n{err1}"

    multi_losses = _losses(args_multi["log_filepath"])
    assert len(multi_losses) == 2
    # Same global batches, same mesh partitioning → same losses up to
    # collective reduction order.
    np.testing.assert_allclose(multi_losses, single_losses, rtol=2e-4)

    # The coordinator-exported best checkpoint matches the single-process one.
    with open(args_single["save_model_path"], "rb") as f:
        tree_single = serialization.msgpack_restore(f.read())
    with open(args_multi["save_model_path"], "rb") as f:
        tree_multi = serialization.msgpack_restore(f.read())
    flat_s = _flatten(tree_single)
    flat_m = _flatten(tree_multi)
    assert flat_s.keys() == flat_m.keys()
    for key in flat_s:
        np.testing.assert_allclose(
            flat_m[key], flat_s[key], rtol=2e-4, atol=1e-6, err_msg=key
        )


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def test_process_row_span_single_process():
    import jax

    from stlt_tpu.parallel.distributed import process_row_span
    from stlt_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(model_parallel=2, batch_size=16)
    lo, hi = process_row_span(batch_sharding(mesh), 16)
    assert (lo, hi) == (0, 16)


def test_make_mesh_refuses_uneven_batch_multiprocess(monkeypatch):
    import jax

    from stlt_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    with pytest.raises(ValueError, match="multi-process"):
        mesh_mod.make_mesh(model_parallel=1, batch_size=6)


def test_make_mesh_warns_on_idle_devices(caplog):
    import logging

    from stlt_tpu.parallel.mesh import make_mesh

    with caplog.at_level(logging.WARNING):
        mesh = make_mesh(model_parallel=1, batch_size=6)
    assert mesh.shape["data"] == 2
    assert any("IDLE" in r.message for r in caplog.records)


def test_loader_rows_reassemble_global_batch():
    """Sharded loaders produce exactly the rows of the unsharded loader."""
    from stlt_tpu.configs import DataConfig
    from stlt_tpu.data import collaters_factory, datasets_factory
    from stlt_tpu.data.loader import Loader

    import tempfile

    with tempfile.TemporaryDirectory() as tmpdir:
        paths, *_ = make_something_fixture(tmpdir, num_videos=6, seed=9)
        cfg = DataConfig(
            dataset_name="something",
            dataset_path=paths["dataset_path"],
            labels_path=paths["labels_path"],
            videoid2size_path=paths["videoid2size_path"],
            train=True,
            layout_num_frames=8,
        )
        dataset = datasets_factory["layout"](cfg)
        collate = collaters_factory["layout"](cfg)

        def batches(rows):
            loader = Loader(
                dataset, 4, collate, shuffle=True, seed=1, prefetch=0, rows=rows
            )
            return list(loader)

        full = batches(None)
        lo = batches((0, 2))
        hi = batches((2, 4))
        assert len(full) == len(lo) == len(hi) == 2
        for fb, lb, hb in zip(full, lo, hi):
            for key in fb:
                merged = np.concatenate([lb[key], hb[key]], axis=0)
                np.testing.assert_array_equal(merged, fb[key], err_msg=key)
