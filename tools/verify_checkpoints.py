"""Released-checkpoint accuracy harness — the north-star claim, executable.

BASELINE.md's acceptance bar is top-1 parity within ±0.2% against the
reference's released checkpoints (reference README.md:37-44 model zoo) on
the Something-Else compositional split. This tool makes that check ONE
command the moment the artifacts are present:

    python tools/verify_checkpoints.py --manifest /path/to/zoo/manifest.json

The manifest binds checkpoint + dataset files + expected metrics; see
``tools/zoo_manifest.example.json`` for the six released checkpoints with
the flag sets the reference README documents (README.md:50-69). Fill each
entry's ``expected`` with the reference's own ``src/inference.py`` printout
(metrics ×100, e.g. ``{"stlt_top1_accuracy": 56.1}``) — entries with an
empty ``expected`` are measured and reported but not asserted, so the
harness is useful before the reference numbers are recorded.

Per entry, one JSON line:
    {"name": ..., "metrics": {...}, "expected": {...}, "pass": true|null}
Exit status 1 if any asserted entry misses its tolerance.

The companion test ``tests/test_released_checkpoints.py`` runs this under
pytest, skipping when no manifest is present (set ``STLT_ZOO_MANIFEST``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

DEFAULT_TOLERANCE = 0.2  # percentage points, the BASELINE.md ±0.2% bar

# argv fragments per entry key; only keys present in the entry are emitted.
_PATH_FLAGS = (
    "checkpoint_path",
    "test_dataset_path",
    "labels_path",
    "videoid2size_path",
    "videos_path",
    "resnet_model_path",
)
_CONFIG_FLAGS = ("dataset_name", "dataset_type", "model_name")


def entry_argv(entry: dict) -> list:
    argv = []
    for key in _CONFIG_FLAGS:
        argv += [f"--{key}", str(entry[key])]
    for key in _PATH_FLAGS:
        if entry.get(key):
            argv += [f"--{key}", str(entry[key])]
    for key, value in entry.get("extra_args", {}).items():
        argv += [f"--{key}", str(value)]
    # batch_size comes from extra_args only — a top-level key would emit a
    # duplicate flag that argparse silently last-wins on (ADVICE r3).
    return argv


def missing_files(entry: dict) -> list:
    return [
        entry[key]
        for key in _PATH_FLAGS
        if entry.get(key) and not os.path.exists(entry[key])
    ]


def run_entry(entry: dict) -> dict:
    """Run inference for one manifest entry; returns the result record."""
    from stlt_tpu.inference import inference
    from stlt_tpu.parser import build_parser

    args = build_parser("checkpoint verification").parse_args(entry_argv(entry))
    metrics = inference(args)
    # The reference prints metrics ×100 rounded to 2dp (inference.py:80-85);
    # manifests record expectations on that scale.
    scaled = {k: round(v * 100, 2) for k, v in metrics.items()}
    expected = entry.get("expected") or {}
    tolerance = float(entry.get("tolerance", DEFAULT_TOLERANCE))
    ok = None
    deltas = {}
    if expected:
        ok = True
        for key, want in expected.items():
            got = scaled.get(key)
            if got is None:
                ok = False
                deltas[key] = "metric missing"
                continue
            deltas[key] = round(got - float(want), 3)
            if abs(got - float(want)) > tolerance:
                ok = False
    return {
        "name": entry.get("name", entry.get("checkpoint_path")),
        "metrics": scaled,
        "expected": expected,
        "delta": deltas,
        "tolerance": tolerance,
        "pass": ok,
    }


def verify_manifest(manifest_path: str, only: str = "") -> list:
    with open(manifest_path) as f:
        manifest = json.load(f)
    base = os.path.dirname(os.path.abspath(manifest_path))
    results = []
    for entry in manifest["entries"]:
        if only and only not in entry.get("name", ""):
            continue
        # Relative paths resolve against the manifest's directory.
        entry = dict(entry)
        for key in _PATH_FLAGS:
            if entry.get(key) and not os.path.isabs(entry[key]):
                entry[key] = os.path.join(base, entry[key])
        absent = missing_files(entry)
        if absent:
            results.append(
                {"name": entry.get("name"), "skipped_missing_files": absent}
            )
            continue
        results.append(run_entry(entry))
    return results


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--manifest",
        default=os.environ.get("STLT_ZOO_MANIFEST", ""),
        help="zoo manifest JSON (or set STLT_ZOO_MANIFEST)",
    )
    parser.add_argument(
        "--only", default="", help="substring filter on entry names"
    )
    args = parser.parse_args()
    if not args.manifest:
        parser.error("--manifest (or STLT_ZOO_MANIFEST) is required")
    results = verify_manifest(args.manifest, args.only)
    failed = False
    for record in results:
        print(json.dumps(record), flush=True)
        if record.get("pass") is False:
            failed = True
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
