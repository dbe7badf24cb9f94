"""Orbax checkpointing: save/auto-resume + weights-only stage-2 init.

Replaces the reference's HF Trainer checkpoint dance: save every N steps
with ``save_total_limit 1`` + auto-resume when a ``checkpoint-*`` dir exists
(reference: gpt4roi/train/train.py:698-712), and the stage-2 bash symlink
trick that warm-starts weights while dropping optimizer state (reference:
train_stage2.sh:14-25) — here that is just restoring the ``params`` item of
a composite checkpoint and building a fresh optimizer.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from gpt4roi_tpu.train.state import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 1):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(
    ckpt_dir: str, state: TrainState, step: int, max_to_keep: int = 1, block: bool = True
) -> None:
    """``block=False`` uses orbax's async save — training resumes while the
    checkpoint streams to disk (call latest_step/wait later to sync)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(state.params),
            opt_state=ocp.args.StandardSave(state.opt_state),
            step=ocp.args.ArraySave(np.asarray(state.step)),
        ),
    )
    if block:
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    import orbax.checkpoint as ocp  # noqa: F401

    return _manager(ckpt_dir).latest_step()


def restore_checkpoint(ckpt_dir: str, template: TrainState, step: Optional[int] = None) -> TrainState:
    """Restore full train state (auto-resume path)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    assert step is not None, f"no checkpoint in {ckpt_dir}"
    out = mgr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(template.params),
            opt_state=ocp.args.StandardRestore(template.opt_state),
            step=ocp.args.ArrayRestore(np.asarray(template.step)),
        ),
    )
    return TrainState(step=out["step"], params=out["params"], opt_state=out["opt_state"])


def _swap_layer_layout(tree: Any) -> Any:
    """Recursively flip decoder param layouts: per-layer ``layers`` list <->
    ``layers_stacked`` tree (the --scan_layers training / serving layout,
    models/llama.py::to_stacked_params). An involution on layout, used both
    to build the alternate restore template and to convert the restored
    tree back to the requested layout."""
    if isinstance(tree, dict):
        # decoder trees carry lm_head; CLIP's transformer also has a
        # "layers" list but is never scan-stacked — leave it alone
        if "layers" in tree and "lm_head" in tree:
            from gpt4roi_tpu.models.llama import to_stacked_params

            tree = to_stacked_params(tree)
        elif "layers_stacked" in tree:
            from gpt4roi_tpu.models.llama import layer_params_list

            layers = layer_params_list(tree)
            tree = {k: v for k, v in tree.items() if k != "layers_stacked"}
            tree["layers"] = layers
        return {
            k: _swap_layer_layout(v) if k not in ("layers", "layers_stacked") else v
            for k, v in tree.items()
        }
    return tree


def restore_params_only(ckpt_dir: str, params_template: Any, step: Optional[int] = None) -> Any:
    """Weights-only restore: fresh optimizer, warm weights — the reference's
    stage-1 -> stage-2 handoff without the bash symlinks.

    Auto-converts decoder layer layouts: an unrolled (``layers`` list)
    checkpoint restores cleanly into a stacked (``--scan_layers``) template
    and vice versa — the stored layout is probed and the restored tree is
    converted, so no hand-invoked ``to_stacked_params`` step is needed."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    assert step is not None, f"no checkpoint in {ckpt_dir}"
    try:
        out = mgr.restore(
            step, args=ocp.args.Composite(params=ocp.args.StandardRestore(params_template))
        )
        return out["params"]
    except Exception:
        # stored layout may be the other decoder layer layout: probe with
        # the swapped template, then convert the result back
        alt_template = _swap_layer_layout(params_template)
        out = mgr.restore(
            step, args=ocp.args.Composite(params=ocp.args.StandardRestore(alt_template))
        )
        return _swap_layer_layout(out["params"])


def save_params_npz(path: str, params: Any) -> None:
    """Flat single-file params export (portable; no orbax dir tree)."""
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(tree)

    walk("", params)
    np.savez(path, **flat)


def load_params_npz(path: str, template: Any) -> Any:
    data = np.load(path)

    def build(prefix, tree):
        if isinstance(tree, dict):
            return {k: build(f"{prefix}/{k}" if prefix else k, v) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [build(f"{prefix}/{i}", v) for i, v in enumerate(tree)]
        return data[prefix]

    return build("", template)
