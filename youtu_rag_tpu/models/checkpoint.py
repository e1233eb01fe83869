"""Training checkpoints (orbax): encoder params + optimizer state + step.

The reference has no training so its 'checkpointing' is incremental index
hashing (SURVEY.md §5.4 — covered by index/persistence.py). The in-process
encoder adds real training, so it gets real checkpoint/resume: orbax
handles sharded arrays transparently, so dp×tp-sharded params round-trip
with their shardings on the same mesh."""

from __future__ import annotations

from pathlib import Path
from typing import Any

from ..utils.log import get_logger

logger = get_logger("models.checkpoint")


class TrainCheckpointer:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, params: Any, opt_state: Any, metadata: dict | None = None) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
                metadata=ocp.args.JsonSave(metadata or {}),
            ),
        )
        self._mgr.wait_until_finished()
        logger.info("saved checkpoint step %d -> %s", step, self.directory)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, params_like: Any = None, opt_state_like: Any = None):
        """Restore (params, opt_state, metadata).

        Pass ``opt_state_like`` (e.g. ``optimizer.init(params)``) to
        recover optax's NamedTuple structure — a template-less restore
        yields plain dicts. Templates also carry target shardings when
        restoring onto a mesh."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, f"no checkpoints under {self.directory}"
        kwargs = {}
        kwargs["params"] = (
            ocp.args.StandardRestore(params_like) if params_like is not None else ocp.args.StandardRestore()
        )
        kwargs["opt_state"] = (
            ocp.args.StandardRestore(opt_state_like)
            if opt_state_like is not None
            else ocp.args.StandardRestore()
        )
        kwargs["metadata"] = ocp.args.JsonRestore()
        out = self._mgr.restore(step, args=ocp.args.Composite(**kwargs))
        return out["params"], out["opt_state"], out["metadata"]

    def close(self) -> None:
        self._mgr.close()
