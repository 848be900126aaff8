"""PyTorch checkpoint → flax parameter-tree converter.

Converts the reference's released ``.pt`` state_dicts (model zoo,
reference README.md:37-44, saved by ``torch.save(model.state_dict())`` at
``src/train.py:150``) and the Kinetics R3D-50 checkpoint into this
framework's parameter pytrees.

Name mapping: flax module names intentionally mirror the reference's torch
attribute names (``backbone.frames_embeddings.layout_embedding...``), so the
translation is mechanical:

- ``layers_{i}``            ↔ torch ``layers.{i}``
- ``kernel``                ↔ torch ``weight`` (transposed for Linear/Conv)
- ``scale``                 ↔ torch LayerNorm/BatchNorm ``weight``
- ``embedding``             ↔ torch Embedding ``weight``
- ``{q,k,v}_proj``          ↔ thirds of torch MHA ``in_proj_weight``/``in_proj_bias``
- prototype ``encoder_layer.*`` entries in torch state_dicts are ignored
  (torch ``nn.TransformerEncoder`` deep-copies the prototype layer, so the
  reference's ``SpatialTransformer.encoder_layer`` params are dead weight).

Loading the raw files requires torch (CPU build is fine); the conversion
itself is pure numpy.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

try:
    from flax import traverse_util
except ImportError:  # pragma: no cover
    traverse_util = None


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.pth file into a flat {name: ndarray} dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        # Kinetics R3D-50 checkpoints wrap the state_dict (reference
        # models.py:201-204).
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _strip_prefix(state_dict: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if not prefix:
        return state_dict
    return {
        k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)
    }


# The reference wraps the R3D in nn.Sequential(*children[:-2])
# (models.py:205), which renumbers submodules: 0=conv1, 1=bn1, 2=relu,
# 3=maxpool, 4..7=layer1..layer4. Released appearance/fusion checkpoints
# therefore contain "…resnet.0.weight" style keys; rename them back.
_SEQUENTIAL_RESNET = {
    "0": "conv1",
    "1": "bn1",
    "4": "layer1",
    "5": "layer2",
    "6": "layer3",
    "7": "layer4",
}
_SEQ_RE = __import__("re").compile(r"(^|\.)resnet\.([0-7])\.")


def _unwrap_sequential_resnet(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    def fix(key: str) -> str:
        while True:
            m = _SEQ_RE.search(key)
            if not m or m.group(2) not in _SEQUENTIAL_RESNET:
                return key
            key = (
                key[: m.start()]
                + f"{m.group(1)}resnet.{_SEQUENTIAL_RESNET[m.group(2)]}."
                + key[m.end():]
            )

    return {fix(k): v for k, v in state_dict.items()}


def _torch_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Translate a flax param path to (torch parameter name, transform).

    transform ∈ {"", "transpose", "conv"}.
    """
    parts = list(path)
    leaf = parts.pop()
    fixed = []
    for p in parts:
        if p.startswith("layers_"):
            fixed.append(f"layers.{p.split('_', 1)[1]}")  # encoder stacks
        elif p in ("downsample_0", "downsample_1"):
            fixed.append(p.replace("_", "."))  # R3D downsample Sequential
        else:
            fixed.append(p)
    module = ".".join(fixed)

    def dotted(name: str) -> str:
        return f"{module}.{name}" if module else name

    if leaf in ("embedding", "scale"):
        return dotted("weight"), ""
    if leaf == "kernel":
        return dotted("weight"), "transpose"
    if leaf in ("bias", "mean", "var"):
        torch_leaf = {"bias": "bias", "mean": "running_mean", "var": "running_var"}[leaf]
        return dotted(torch_leaf), ""
    # Raw params (position_embeddings, cls_token, pos_embed) keep their name.
    return dotted(leaf), ""


def _fetch(
    state_dict: Dict[str, np.ndarray], path: Tuple[str, ...], template: np.ndarray
) -> np.ndarray:
    """Fetch + transform the torch tensor for one flax param leaf."""
    # MHA in-projections: torch stacks q/k/v as in_proj_weight [3H, H].
    if len(path) >= 2 and path[-2] in ("q_proj", "k_proj", "v_proj"):  # noqa: SIM102
        which = {"q_proj": 0, "k_proj": 1, "v_proj": 2}[path[-2]]
        module = ".".join(
            f"layers.{p.split('_', 1)[1]}" if p.startswith("layers_") else p
            for p in path[:-2]
        )
        leaf = path[-1]
        if leaf == "kernel":
            w = state_dict[f"{module}.in_proj_weight"]
            hidden = w.shape[0] // 3
            return w[which * hidden:(which + 1) * hidden].T
        if leaf == "bias":
            b = state_dict[f"{module}.in_proj_bias"]
            hidden = b.shape[0] // 3
            return b[which * hidden:(which + 1) * hidden]
    key, transform = _torch_key(path)
    if key not in state_dict and f"{key}.weight" in state_dict:
        # flax raw params that are nn.Embedding tables in torch
        # (e.g. FramesEmbeddings.position_embeddings).
        key = f"{key}.weight"
    arr = state_dict[key]
    if transform == "transpose":
        if arr.ndim == 2:
            arr = arr.T
        elif arr.ndim == 5:
            # torch Conv3d weight [out, in, kT, kH, kW] → flax [kT, kH, kW, in, out]
            arr = arr.transpose(2, 3, 4, 1, 0)
        elif arr.ndim == 1:
            pass
        else:
            raise ValueError(f"unexpected weight rank for {key}: {arr.shape}")
    return arr


def load_kinetics_r3d(params: Any, path: str) -> Any:
    """Load the Kinetics R3D checkpoint (``r3d50_KMS_200ep.pth``, reference
    models.py:201-204) into every raw-R3D subtree of ``params`` (the subtree
    with conv1/bn1/layer1.0 children). The checkpoint's avgpool/fc are
    ignored, like the reference's children[:-2] strip (models.py:205)."""
    sd = load_torch_state_dict(path)

    def walk(node):
        if isinstance(node, dict) and {"conv1", "bn1", "layer1.0"} <= set(node):
            return torch_to_flax_params(sd, node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def torch_to_flax_params(
    state_dict: Dict[str, np.ndarray],
    params_template: Any,
    *,
    strip_prefix: str = "",
    strict: bool = True,
) -> Any:
    """Fill a flax param-tree template with values from a torch state_dict.

    ``params_template`` is the pytree from ``model.init(...)["params"]`` —
    only its structure and shapes are used. With ``strict=False``, leaves
    missing from the state_dict keep their template values (the reference's
    ``strict=False`` fallback for score_embeddings, inference.py:59-69).
    """
    sd = _unwrap_sequential_resnet(_strip_prefix(state_dict, strip_prefix))
    flat = traverse_util.flatten_dict(params_template)
    out = {}
    for path, template in flat.items():
        try:
            arr = _fetch(sd, path, np.asarray(template))
        except KeyError:
            if strict:
                key, _ = _torch_key(path)
                raise KeyError(f"missing torch parameter for {'/'.join(path)} ({key})")
            out[path] = template
            continue
        expected = np.asarray(template).shape
        if tuple(arr.shape) != tuple(expected):
            if _is_position_table(path, arr.shape, expected):
                # Checkpoint trained at a different clip length: resample the
                # learned frame-position table (see resize_position_table).
                arr = resize_position_table(arr, expected[0])
            else:
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: torch {arr.shape} vs flax {expected}"
                )
        out[path] = arr.astype(np.asarray(template).dtype)
    return traverse_util.unflatten_dict(out)


_SEQUENTIAL_RESNET_INV = {v: k for k, v in _SEQUENTIAL_RESNET.items()}
_SEQ_INV_RE = __import__("re").compile(
    r"(^|\.)resnet\.(conv1|bn1|layer1|layer2|layer3|layer4)\."
)


def _rewrap_sequential_resnet(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse of ``_unwrap_sequential_resnet``: the reference's ``Resnet3D``
    wraps the trunk in ``nn.Sequential`` (models.py:205), so its state_dict
    keys use numeric indices (``resnet.0.weight``)."""
    def fix(key: str) -> str:
        while True:
            m = _SEQ_INV_RE.search(key)
            if not m:
                return key
            key = (
                key[: m.start()]
                + f"{m.group(1)}resnet.{_SEQUENTIAL_RESNET_INV[m.group(2)]}."
                + key[m.end():]
            )

    return {fix(k): v for k, v in state_dict.items()}


def flax_to_torch_state_dict(params: Any) -> Dict[str, np.ndarray]:
    """Export a flax param tree as a reference-compatible torch state_dict.

    The exact inverse of ``torch_to_flax_params``: kernels transpose back,
    q/k/v projections restack into MHA ``in_proj_weight``/``in_proj_bias``,
    the R3D trunk re-wraps into the reference's ``nn.Sequential`` numbering,
    and the spatial transformer's dead prototype layer
    (``SpatialTransformer.encoder_layer``, reference models.py:46-54 — present
    in every released checkpoint) is emitted as a copy of ``layers.0`` so
    ``load_state_dict(strict=True)`` succeeds. The result torch.saves into a
    file the reference's ``inference.py:59-69`` loads directly.
    """
    flat = traverse_util.flatten_dict(params)
    out: Dict[str, np.ndarray] = {}
    inproj: Dict[str, list] = {}
    for path, value in flat.items():
        v = np.asarray(value)
        if len(path) >= 2 and path[-2] in ("q_proj", "k_proj", "v_proj"):
            which = {"q_proj": 0, "k_proj": 1, "v_proj": 2}[path[-2]]
            module = ".".join(
                f"layers.{p.split('_', 1)[1]}" if p.startswith("layers_") else p
                for p in path[:-2]
            )
            slot = "in_proj_weight" if path[-1] == "kernel" else "in_proj_bias"
            parts = inproj.setdefault(f"{module}.{slot}", [None, None, None])
            parts[which] = v.T if path[-1] == "kernel" else v
            continue
        key, transform = _torch_key(path)
        if transform == "transpose":
            if v.ndim == 2:
                v = v.T
            elif v.ndim == 5:
                # flax [kT, kH, kW, in, out] → torch [out, in, kT, kH, kW]
                v = v.transpose(4, 3, 0, 1, 2)
            elif v.ndim != 1:
                raise ValueError(f"unexpected kernel rank at {key}: {v.shape}")
        if path[-1] == "position_embeddings":
            # nn.Embedding on the torch side, plus the registered arange
            # buffer (FramesEmbeddings, reference models.py:88-96).
            out[f"{key[:-len('position_embeddings')]}position_ids"] = (
                np.arange(v.shape[0], dtype=np.int64)[None]
            )
            key = f"{key}.weight"
        out[key] = v
    for key, parts in inproj.items():
        assert all(p is not None for p in parts), f"incomplete q/k/v at {key}"
        out[key] = np.concatenate(parts, axis=0)
    out = _rewrap_sequential_resnet(out)
    # torch BatchNorm buffers include num_batches_tracked (long scalar;
    # value irrelevant — the reference pins BN to eval, models.py:206-219).
    for key in [k for k in out if k.endswith(".running_mean")]:
        out[key[: -len("running_mean")] + "num_batches_tracked"] = np.asarray(
            0, dtype=np.int64
        )
    # Prototype layer of the spatial encoder (deep-copied, never trained —
    # fill with layer 0's values, which is what a fresh reference model holds).
    for key in list(out):
        marker = ".layout_embedding.transformer.layers.0."
        if marker in key:
            head, rest = key.split(marker, 1)
            out[f"{head}.layout_embedding.encoder_layer.{rest}"] = out[key]
    _fill_dead_reference_params(out)
    return out


def _fill_dead_reference_params(out: Dict[str, np.ndarray]) -> None:
    """Zero-fill params the reference constructs but never runs, so
    ``strict=True`` loads succeed. Flax only materializes what a forward
    touches; the torch modules own three dead-weight families regardless:

    - ``score_embeddings`` (CategoryBoxEmbeddings, models.py:26 — used only
      when the batch carries detector scores, i.e. action_genome);
    - ``Resnet3D.classifier`` / ``TransformerResnet.classifier`` inside the
      fusion models (models.py:212, :252 — the fusion heads replace them).
    """
    head_rows = next(
        (v.shape[0] for k, v in out.items() if k.endswith("fc2.weight")), None
    )
    for key in list(out):
        if key.endswith("category_embeddings.weight"):
            base = key[: -len("category_embeddings.weight")]
            if f"{base}score_embeddings.weight" not in out:
                hidden = out[key].shape[1]
                out[f"{base}score_embeddings.weight"] = np.zeros((hidden, 1), np.float32)
                out[f"{base}score_embeddings.bias"] = np.zeros((hidden,), np.float32)
        if key.endswith("projector.weight"):
            base = key[: -len("projector.weight")]  # a TransformerResnet root
            hidden = out[key].shape[0]
            # Standalone resnet3d-transformer exports its OWN classifier —
            # num_classes comes from it; fusion models (classifier unused,
            # never materialized by flax) fall back to a head's fc2.
            own = out.get(f"{base}classifier.weight")
            rows = own.shape[0] if own is not None else head_rows
            if rows is None:
                continue
            if own is None:
                out[f"{base}classifier.weight"] = np.zeros((rows, hidden), np.float32)
                out[f"{base}classifier.bias"] = np.zeros((rows,), np.float32)
            if (f"{base}resnet.resnet.0.weight" in out
                    and f"{base}resnet.classifier.weight" not in out):
                # reference Resnet3D hardcodes Linear(2048, C) (models.py:212)
                out[f"{base}resnet.classifier.weight"] = np.zeros((rows, 2048), np.float32)
                out[f"{base}resnet.classifier.bias"] = np.zeros((rows,), np.float32)


def save_torch_checkpoint(path: str, params: Any) -> None:
    """torch.save a flax param tree in the reference's checkpoint format."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(params).items()}
    torch.save(sd, path)


def _is_position_table(path: Tuple[str, ...], got, expected) -> bool:
    """A [rows, H] frame-position table whose only mismatch is the row count."""
    return (
        path[-1] == "position_embeddings"
        and len(got) == 2
        and len(expected) == 2
        and got[1] == expected[1]
    )


def resize_position_table(
    table: np.ndarray, rows: int, mode: str = "interpolate"
) -> np.ndarray:
    """Resample a learned ``[rows_old, H]`` position table to ``rows``.

    The reference pins the layout position table to 256 frames
    (``src/modelling/configs.py:109``) and crashes beyond it; this framework
    grows the table with the padded frame axis (``configs.position_table_rows``)
    so >255-frame clips run.

    ``mode="interpolate"`` (default): ViT-style align-corners linear
    interpolation over the frame index — row 0 and the last row are preserved
    exactly, the table's *relative* temporal structure is stretched. This is
    the right choice when the new clip length re-spans the same video (the
    sampler picks frames proportionally, so frame i of a 512-frame clip sits
    where frame ~i/2 of a 256-frame clip did).

    ``mode="extend"`` (grow-only): rows ``0..rows_old-1`` are kept EXACTLY and
    the tail repeats the last learned row — preserves absolute temporal
    positions for the learned prefix, at the cost of an uninformative tail
    until fine-tuned. The right choice when existing positions must keep
    their learned meaning (e.g. fine-tuning at a longer length where early
    frames still mean "early by absolute index").
    """
    table = np.asarray(table)
    old = table.shape[0]
    if old == rows:
        return table
    if mode == "extend":
        if rows < old:
            raise ValueError(
                f"mode='extend' only grows tables ({old} -> {rows} shrinks); "
                "use mode='interpolate'"
            )
        return np.concatenate(
            [table, np.repeat(table[-1:], rows - old, axis=0)], axis=0
        )
    if mode != "interpolate":
        raise ValueError(f"unknown resize mode {mode!r}")
    if old < 2:
        raise ValueError(f"cannot resample a {old}-row position table")
    # Fractional source index for each target row (endpoints align).
    pos = np.linspace(0.0, float(old - 1), rows)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, old - 1)
    frac = (pos - lo)[:, None].astype(np.float64)
    out = table[lo].astype(np.float64) * (1.0 - frac) + table[hi].astype(np.float64) * frac
    return out.astype(table.dtype)
