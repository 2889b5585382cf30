"""Checkpoint save / auto-resume.

Reference mechanisms being reproduced (SURVEY.md §5): Lightning
ModelCheckpoint keeping `last` + top-k by val accuracy
(reference: utils.py:94-112) and the resume scan picking the latest
checkpoint (utils.py:115-168). Orbax handles the atomic async writes;
state is a pure pytree so multi-host / sharded arrays come free.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        keep_best_metric: str = "val_acc",
    ):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.metric = keep_best_metric
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=(lambda m: m.get(keep_best_metric, 0.0)),
                best_mode="max",
                create=True,
            ),
        )

    def save(self, step: int, state, metrics: Optional[dict] = None):
        metrics = {
            k: float(v) for k, v in (metrics or {}).items()
        }
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(_savable(state)),
            metrics=metrics,
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def latest_metrics(self) -> Optional[dict]:
        """Metrics dict recorded with the newest checkpoint (fit()
        stashes the epoch there so resume restarts at the right epoch
        even if the loader length changed)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            return dict(self._mgr.metadata(step).metrics or {})
        except Exception:
            return None

    def restore(self, state_template) -> Any:
        """Restore the newest checkpoint into the template's structure
        (shapes/shardings from the template)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(_savable(state_template)),
        )
        return state_template.replace(**restored)


def _savable(state) -> dict:
    """TrainState -> plain dict of its pytree fields (tx/apply_fn are
    static and must not be serialized)."""
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def export_params(path: str, state) -> None:
    """Raw-params export for deployment (the analog of the reference's
    torch.save(state_dict), test_lseg.py:304-306) as an .npz of flat
    'a/b/c' keys."""
    flat = {}

    def visit(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    visit("", {"params": state.params, "batch_stats": state.batch_stats})
    np.savez(path, **flat)


def import_params(path: str) -> dict:
    """Inverse of `export_params`: .npz -> nested variables dict."""
    flat = np.load(path)
    out: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return out
