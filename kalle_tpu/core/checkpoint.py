"""Checkpoint save/restore (orbax) + reference-checkpoint import.

Improvements over the reference (SURVEY.md §5):
  * optimizer + scheduler state IS saved (the reference only saved the
    model state_dict and restarted optimizer state on resume,
    ref train_offline.py:261-264)
  * step/epoch live in the checkpoint, not the filename
    (ref train.py:94-109 parses `epoch_E_step_S.pt` filenames)
Auto-resume keeps the reference behavior: pick the newest checkpoint in
output_dir, else fall back to `start_checkpoint` (ref train_offline.py:117-132).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Tuple[Any, int]:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return state_template, 0
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def load_reference_llasa_checkpoint(path: str, cfg) -> dict:
    """Warm-start from a reference `epoch_E_step_S.pt` state_dict
    (ref train_offline.py:130-132 load_state_dict strict=False)."""
    from ..models.lm.convert import llasa_params_from_state_dict, load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    return llasa_params_from_state_dict(sd, cfg)


def save_params_npz(path: str, params: dict) -> None:
    """Flat .npz export (host-portable, torch-free)."""
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    walk("", params)
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    data = np.load(path)
    tree: dict = {}
    for k in data.files:
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[k]
    return tree
