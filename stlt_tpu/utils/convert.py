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


def _is_position_table(path: Tuple[str, ...], got, expected) -> bool:
    """A [rows, H] frame-position table whose only mismatch is the row count."""
    return (
        path[-1] == "position_embeddings"
        and len(got) == 2
        and len(expected) == 2
        and got[1] == expected[1]
    )


def resize_position_table(table: np.ndarray, rows: int) -> np.ndarray:
    """Linearly resample a learned ``[rows_old, H]`` position table to ``rows``.

    The reference pins the layout position table to 256 frames
    (``src/modelling/configs.py:109``) and crashes beyond it; this framework
    grows the table with the padded frame axis (``configs.position_table_rows``)
    so >255-frame clips run. Checkpoints trained at one length load at another
    via ViT-style align-corners linear interpolation over the frame index —
    row 0 and the last row are preserved exactly.
    """
    table = np.asarray(table)
    old = table.shape[0]
    if old == rows:
        return table
    if old < 2:
        raise ValueError(f"cannot resample a {old}-row position table")
    # Fractional source index for each target row (endpoints align).
    pos = np.linspace(0.0, float(old - 1), rows)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, old - 1)
    frac = (pos - lo)[:, None].astype(np.float64)
    out = table[lo].astype(np.float64) * (1.0 - frac) + table[hi].astype(np.float64) * frac
    return out.astype(table.dtype)
