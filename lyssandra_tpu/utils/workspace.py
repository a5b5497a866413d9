"""Experiment workspace: checkpoint/resume + result persistence.

The reference's workspace manager pickles/np.saves dictionaries and results
between experiment stages (SURVEY.md §5 'Checkpoint / resume').  The rebuild
uses Orbax for jax pytree state (resumable long K-SVD / online-DL runs:
preemption = resume) and .npz export for NumPy interop with the oracle.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax


class Workspace:
    """Directory-backed experiment store.

    ws = Workspace('runs/exp1')
    ws.save_array('D', D); D = ws.load_array('D')
    ws.save_state(step, {'D': D, 'A': A, 'B': B})   # orbax checkpoint
    step, state = ws.load_latest_state(template)
    ws.log_metrics({'objective': ..., 'iter': 3})
    """

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self._ckpt_dir = os.path.join(self.root, "checkpoints")
        self._metrics_path = os.path.join(self.root, "metrics.jsonl")

    # ---- arrays (.npz interop with the NumPy oracle) ----------------------

    def save_array(self, name: str, *arrays, **named) -> str:
        path = os.path.join(self.root, f"{name}.npz")
        if arrays and not named:
            named = {f"arr_{i}": a for i, a in enumerate(arrays)}
        np.savez(path, **{k: np.asarray(v) for k, v in named.items()})
        return path

    def load_array(self, name: str):
        with np.load(os.path.join(self.root, f"{name}.npz")) as z:
            keys = list(z.keys())
            if keys == ["arr_0"]:
                return z["arr_0"]
            return {k: z[k] for k in keys}

    # ---- orbax checkpoints (pytree state, resumable) ----------------------

    def _mngr(self):
        import orbax.checkpoint as ocp

        return ocp.CheckpointManager(
            self._ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=3),
        )

    def save_state(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        with self._mngr() as m:
            m.save(step, args=ocp.args.StandardSave(state))
            m.wait_until_finished()

    def load_latest_state(self, template: Any = None):
        """Returns (step, state) or (None, None) if no checkpoint exists."""
        import orbax.checkpoint as ocp

        with self._mngr() as m:
            step = m.latest_step()
            if step is None:
                return None, None
            if template is not None:
                state = m.restore(
                    step, args=ocp.args.StandardRestore(template)
                )
            else:
                state = m.restore(step)
            return step, state

    # ---- metrics log ------------------------------------------------------

    def log_metrics(self, metrics: dict) -> None:
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(metrics) + "\n")

    def read_metrics(self) -> list[dict]:
        if not os.path.exists(self._metrics_path):
            return []
        with open(self._metrics_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    # ---- results ----------------------------------------------------------

    def save_json(self, name: str, obj: Any) -> str:
        path = os.path.join(self.root, f"{name}.json")
        with open(path, "w") as f:
            json.dump(obj, f, indent=2, default=str)
        return path

    def load_json(self, name: str) -> Any:
        with open(os.path.join(self.root, f"{name}.json")) as f:
            return json.load(f)
