"""Checkpoint / resume at task boundaries.

The reference never persists training state (grep-verified; SURVEY.md §5) —
a crash loses the run. Here, after every task the full ``TrainState``
(params, optimizer state, method variables incl. device-resident buffers,
PRNG, task scalar, class masks), the accuracy table, the host-side exemplar
buffer, and any method host state (e.g. GPM's variable-rank subspace lists)
are written with Orbax; ``Trainer`` resumes from the last completed task.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckpt_dir(base: str, task_idx: int) -> str:
    return os.path.join(os.path.abspath(base), f"task_{task_idx:03d}")


def save(base: str, task_idx: int, state, acc_table: np.ndarray, buffer,
         method, keep: int = 0) -> None:
    """``keep`` > 0 prunes all but the newest ``keep`` task
    directories after a successful save (checkpoint.keep in the config) —
    a full TrainState per task grows unboundedly otherwise."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(base, task_idx)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state, force=True)
    ckptr.wait_until_finished()
    host: Dict[str, Any] = {
        "acc_table": acc_table,
        "buffer_images": buffer.images,
        "buffer_labels": buffer.labels,
        "buffer_total_classes": buffer.total_classes,
        "method_host": method_host_state(method),
        "task_idx": task_idx,
    }
    with open(os.path.join(path, "host.pkl"), "wb") as f:
        pickle.dump(host, f)
    if keep and keep > 0:
        import shutil

        tasks = sorted(
            int(d.split("_")[1])
            for d in os.listdir(base)
            if d.startswith("task_") and d.split("_")[1].isdigit()
        )
        for old_t in tasks[:-keep]:
            shutil.rmtree(_ckpt_dir(base, old_t), ignore_errors=True)


def latest_task(base: str) -> Optional[int]:
    if not base or not os.path.isdir(base):
        return None
    tasks = [
        int(d.split("_")[1])
        for d in os.listdir(base)
        if d.startswith("task_") and os.path.exists(os.path.join(base, d, "host.pkl"))
    ]
    return max(tasks) if tasks else None


def restore(base: str, task_idx: int, state_template, buffer, method):
    import orbax.checkpoint as ocp

    path = _ckpt_dir(base, task_idx)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(path, "state"), state_template)
    with open(os.path.join(path, "host.pkl"), "rb") as f:
        host = pickle.load(f)
    buffer.images = host["buffer_images"]
    buffer.labels = host["buffer_labels"]
    buffer.total_classes = host["buffer_total_classes"]
    load_method_host_state(method, host["method_host"])
    return state, host["acc_table"]


DEFAULT_HOST_ATTRS = (
    "_feature_list", "_project_type", "_task_spaces", "_class_means",
    "_class_chol", "_seen", "_task_counts", "_cur_rank", "per_layer_retain",
)


def method_host_state(method) -> Dict[str, Any]:
    """Host-side method attributes that live outside the TrainState pytree
    (variable-rank subspace lists etc.). Methods extend the default list by
    declaring ``host_state_attrs`` — new host state must be registered there
    or it silently resets to __init__ values on resume."""
    out = {}
    attrs = DEFAULT_HOST_ATTRS + tuple(getattr(method, "host_state_attrs", ()))
    for attr in attrs:
        if hasattr(method, attr):
            out[attr] = getattr(method, attr)
    return out


def load_method_host_state(method, host: Dict[str, Any]) -> None:
    for k, v in (host or {}).items():
        setattr(method, k, v)
