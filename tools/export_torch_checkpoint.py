"""Export a trained stlt_tpu msgpack checkpoint as a reference-loadable .pt.

The inverse of the load-path converter (``stlt_tpu/utils/convert.py``): users
can train in this framework and evaluate with the reference codebase
(``/root/reference`` ``src/inference.py:59-69`` loads the result with
``load_state_dict``; ``strict=True`` succeeds — prototype layers,
``position_ids`` buffers and BN ``num_batches_tracked`` are all emitted).

    python tools/export_torch_checkpoint.py \
        --checkpoint_path models/best.msgpack --output_path models/best.pt
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint_path", required=True,
                        help="flax msgpack params file (save_model_path output)")
    parser.add_argument("--output_path", required=True,
                        help="torch .pt state_dict to write")
    args = parser.parse_args(argv)

    from flax import serialization

    from stlt_tpu.utils.convert import save_torch_checkpoint

    with open(args.checkpoint_path, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    save_torch_checkpoint(args.output_path, params)
    print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
