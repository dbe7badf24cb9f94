"""Delta-weight CLI (LLaMA licence workaround) over npz param exports.

Equivalent of the reference's ``python -m scripts.make_delta`` /
``apply_delta`` (reference: scripts/apply_delta.py:16-44):

  python scripts/delta_weights.py make  --base base.npz --target tuned.npz --out delta.npz
  python scripts/delta_weights.py apply --base base.npz --delta delta.npz --out tuned.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_flat(path):
    data = np.load(path)
    return {k: data[k] for k in data.files}


def _unflatten(flat):
    # npz export uses "/"-joined paths with integer list indices
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def main():
    from gpt4roi_tpu.train.checkpoints import save_params_npz
    from gpt4roi_tpu.utils.delta import apply_delta, make_delta

    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["make", "apply"])
    p.add_argument("--base", required=True)
    p.add_argument("--target")
    p.add_argument("--delta")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    base = _unflatten(_load_flat(args.base))
    if args.mode == "make":
        assert args.target, "--target required for make"
        target = _unflatten(_load_flat(args.target))
        out = make_delta(base, target)
    else:
        assert args.delta, "--delta required for apply"
        delta = _unflatten(_load_flat(args.delta))
        out = apply_delta(base, delta)
    save_params_npz(args.out, out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
