"""Released-checkpoint accuracy harness (tools/verify_checkpoints.py).

Two layers:

- The MECHANISM is always tested: a synthetic manifest (fixture dataset +
  a checkpoint produced by the real train CLI) must round-trip through the
  harness, pass at its own recorded metrics, and FAIL when an expectation
  is perturbed beyond the ±0.2 tolerance — so the north-star assert is
  known-sharp before the real artifacts exist.
- The REAL model-zoo run executes whenever ``STLT_ZOO_MANIFEST`` points at
  a manifest (see tools/zoo_manifest.example.json) — the moment the
  released ``.pt`` files and val JSONs are present, `pytest
  tests/test_released_checkpoints.py` becomes the executable ±0.2% parity
  claim (reference README.md:37-44).
"""

import json
import os

import pytest

from tests.fixtures import make_something_fixture


@pytest.fixture(scope="module")
def synthetic_zoo(tmp_path_factory):
    """Train a tiny STLT on the fixture dataset and emit a manifest whose
    expectations are the measured metrics."""
    from stlt_tpu.parser import build_parser
    from stlt_tpu.train import train

    zoo = str(tmp_path_factory.mktemp("zoo"))
    paths, *_ = make_something_fixture(zoo, num_videos=8, seed=7)
    ckpt = os.path.join(zoo, "stlt_fixture.msgpack")
    argv = [
        "--dataset_name", "something",
        "--dataset_type", "layout",
        "--model_name", "stlt",
        "--train_dataset_path", paths["dataset_path"],
        "--val_dataset_path", paths["dataset_path"],
        "--labels_path", paths["labels_path"],
        "--videoid2size_path", paths["videoid2size_path"],
        "--layout_num_frames", "8",
        "--batch_size", "4",
        "--epochs", "1",
        "--warmup_epochs", "1",
        "--hidden_size", "32",
        "--num_attention_heads", "4",
        "--num_spatial_layers", "1",
        "--num_temporal_layers", "1",
        "--save_model_path", ckpt,
    ]
    result = train(build_parser("zoo fixture").parse_args(argv))
    metrics = {
        k: round(v * 100, 2) for k, v in result.epochs[-1]["metrics"].items()
    }
    entry = {
        "name": "stlt-fixture",
        "model_name": "stlt",
        "dataset_name": "something",
        "dataset_type": "layout",
        "checkpoint_path": ckpt,
        "test_dataset_path": paths["dataset_path"],
        "labels_path": paths["labels_path"],
        "videoid2size_path": paths["videoid2size_path"],
        "extra_args": {
            "layout_num_frames": 8, "batch_size": 4, "hidden_size": 32,
            "num_attention_heads": 4, "num_spatial_layers": 1,
            "num_temporal_layers": 1,
        },
        "expected": metrics,
        "tolerance": 0.2,
    }
    manifest = os.path.join(zoo, "manifest.json")
    json.dump({"entries": [entry]}, open(manifest, "w"))
    return manifest, entry, metrics


def test_harness_passes_at_recorded_metrics(synthetic_zoo):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from verify_checkpoints import verify_manifest

    manifest, _entry, _metrics = synthetic_zoo
    results = verify_manifest(manifest)
    assert len(results) == 1
    assert results[0]["pass"] is True, results


def test_harness_fails_on_perturbed_expectation(synthetic_zoo, tmp_path):
    """A 0.3-point expectation shift (> the ±0.2 bar) must fail — the parity
    assert is sharp, not vacuous."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from verify_checkpoints import verify_manifest

    _manifest, entry, metrics = synthetic_zoo
    bad = dict(entry)
    bad["expected"] = {
        k: round(v + 0.3, 2) for k, v in metrics.items()
    }
    manifest = tmp_path / "bad_manifest.json"
    json.dump({"entries": [bad]}, open(manifest, "w"))
    results = verify_manifest(str(manifest))
    assert results[0]["pass"] is False, results


def test_harness_skips_missing_files(synthetic_zoo, tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from verify_checkpoints import verify_manifest

    _manifest, entry, _ = synthetic_zoo
    gone = dict(entry, checkpoint_path=str(tmp_path / "nope.pt"))
    manifest = tmp_path / "missing_manifest.json"
    json.dump({"entries": [gone]}, open(manifest, "w"))
    results = verify_manifest(str(manifest))
    assert "skipped_missing_files" in results[0]


_ZOO = os.environ.get("STLT_ZOO_MANIFEST", "")


@pytest.mark.skipif(
    not (_ZOO and os.path.exists(_ZOO)),
    reason="set STLT_ZOO_MANIFEST to the released-model-zoo manifest "
    "(tools/zoo_manifest.example.json) to run the ±0.2%% parity check",
)
def test_released_checkpoints_match_reference():
    """THE north-star assert: released checkpoints reproduce the reference's
    recorded metrics within ±0.2 points."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from verify_checkpoints import verify_manifest

    results = verify_manifest(_ZOO)
    ran = [r for r in results if "metrics" in r]
    assert ran, f"no runnable entries: {results}"
    bad = [r for r in ran if r["pass"] is False]
    assert not bad, bad
