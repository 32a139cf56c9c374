"""Model persistence + training resume via orbax.

The reference persists only final ``state_dict`` blobs with no resume
(train_xrays_example.py:766-772).  TPU-native upgrade (SURVEY.md §5):
orbax checkpoints of the full TrainState (params + optimizer state + step)
with periodic saves and restart-from-latest — the standard pattern for
preemptible TPU jobs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["CheckpointManager", "save_params", "load_params"]


class CheckpointManager:
    """Periodic TrainState checkpointing with resume.

    Thin wrapper over ``orbax.checkpoint.CheckpointManager`` pinned to this
    framework's TrainState pytree layout.
    """

    def __init__(
        self,
        directory: str,
        *,
        save_interval_steps: int = 1000,
        max_to_keep: int = 3,
    ):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                save_interval_steps=save_interval_steps,
                max_to_keep=max_to_keep,
                create=True,
            ),
        )

    def save(self, step: int, state: Any, *, force: bool = False) -> bool:
        """Save if the interval policy says so (or ``force``).

        Saves are ASYNC: orbax may still be reading ``state``'s device
        buffers after this returns.  Feeding the same ``state`` to a
        buffer-donating train step (the ``make_*_train_step`` default,
        ``donate=True``) lets XLA reuse those buffers mid-save and can
        corrupt the checkpoint — build the step with ``donate=False``
        when checkpointing mid-run (what :func:`aecf_tpu.train.fit`
        does), or call :meth:`wait` before the next step.
        """
        saved = self.manager.save(
            step,
            args=self._ocp.args.StandardSave(state),
            force=force,
        )
        return bool(saved)

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        """Restore the given (or latest) step into ``abstract_state``'s
        structure/shardings.  Returns None when no checkpoint exists."""
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract_state)
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()


def save_params(path: str, params: Any) -> None:
    """One-shot params save (the reference's torch.save equivalent)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, abstract_params: Any) -> Any:
    """One-shot params load into the given pytree structure."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_params)
