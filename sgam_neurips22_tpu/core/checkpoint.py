"""Checkpoint save/restore (Orbax) + emergency/signal checkpointing.

Replaces the reference's Lightning checkpoint stack (SURVEY.md section 5.4):
- `ModelCheckpoint` top-k + save_last (train CLI)
- `CheckpointEveryNSteps` (data/utils/utils.py:34-72)
- SIGUSR1/crash 'melk' emergency save
  (train_generative_sensing_model.py:204-225)

State is a plain pytree: {params, opt_state(s), step, ...}. Atomicity and
async writes come from Orbax.
"""
from __future__ import annotations

import os
import signal
from typing import Any, Callable, Optional

import orbax.checkpoint as ocp

# signal-deferral state: Python delivers signals on the main thread between
# bytecodes, so a handler can fire INSIDE an in-flight CheckpointManager.save
# (same thread, re-entrant). Writing a second checkpoint for the same step
# from the handler then collides with the interrupted save, and exiting from
# the handler aborts it. save() brackets itself with _IN_SAVE; the handler
# defers its action until the in-flight save finalizes.
_IN_SAVE = False
_DEFERRED: list = []


def _run_deferred() -> None:
    while _DEFERRED:
        _DEFERRED.pop(0)()


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with step-interval and
    keep-last-k policies."""

    def __init__(
        self,
        directory: str,
        save_interval_steps: int = 10_000,
        max_to_keep: int = 3,
        monitor: Optional[str] = None,
        best_mode: str = "min",
    ):
        """With `monitor` set, keeps the top-k checkpoints by that metric
        (the reference's ModelCheckpoint monitor/save_top_k behavior,
        train_generative_sensing_model.py:124-140); pass the metrics dict to
        `save`."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                save_interval_steps=save_interval_steps,
                max_to_keep=max_to_keep,
                best_fn=(lambda m: m[monitor]) if monitor else None,
                best_mode=best_mode,
                create=True,
            ),
        )

    def save(
        self, step: int, state: Any, force: bool = False,
        metrics: Optional[dict] = None,
    ) -> bool:
        global _IN_SAVE
        outer = _IN_SAVE
        _IN_SAVE = True
        try:
            return self._mgr.save(
                step, args=ocp.args.StandardSave(state), force=force,
                metrics=metrics,
            )
        finally:
            _IN_SAVE = outer
            if not outer:
                _run_deferred()

    def should_save(self, step: int) -> bool:
        """True iff save(step) would actually write (interval check). Callers
        gate the device->host state transfer on this — fetching ~1 GB of
        train state through the remote-TPU tunnel on every no-op save was
        measured at ~60 s/step (NOTES.md round 2)."""
        return bool(self._mgr.should_save(step))

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore WITHOUT a template tree (numpy pytree exactly as saved).
        Lets inference CLIs load params out of a train-state checkpoint
        without reconstructing the optimizer-state structure."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        # read the StandardSave item directly with the PyTree reader: the
        # manager's template-free restore path warns (and on this orbax
        # version fails) without a CheckpointArgs
        d = os.path.join(str(self._mgr.directory), str(step))
        item = os.path.join(d, "default")
        try:
            return ocp.PyTreeCheckpointer().restore(
                item if os.path.isdir(item) else d
            )
        except (TypeError, ValueError, FileNotFoundError):
            return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def restore_raw_from_path(path: str) -> Any:
    """Raw saved tree (numpy pytree, template-free) from any orbax layout
    train.py produces: a run dir (``<logdir>/<run>`` containing
    ``checkpoints/``), the checkpoints dir itself, or a single step dir.
    Latest step wins."""
    sub = os.path.join(path, "checkpoints")
    ckdir = sub if os.path.isdir(sub) else path
    base = os.path.basename(ckdir.rstrip(os.sep))
    # a step dir's basename is numeric AND it holds orbax step content —
    # a run dir merely NAMED '123' (train.py -n 123) must not be
    # misrouted to its parent as if it were a step
    looks_like_step = base.isdigit() and (
        os.path.isdir(os.path.join(ckdir, "default"))
        or os.path.exists(os.path.join(ckdir, "_CHECKPOINT_METADATA"))
    )
    if looks_like_step:
        mgr = CheckpointManager(os.path.dirname(ckdir.rstrip(os.sep)))
        return mgr.restore_raw(int(base))
    return CheckpointManager(ckdir).restore_raw()


def install_signal_checkpoint(save_fn: Callable[[], None]) -> None:
    """SIGUSR1/SIGTERM -> emergency checkpoint (the reference's `melk`
    handler, train_generative_sensing_model.py:204-217; SIGTERM added for
    TPU preemption)."""

    def action(signum):
        print(f"signal {signum}: writing emergency checkpoint")
        save_fn()
        if signum == signal.SIGTERM:
            # preemption semantics: persist, then stop. (SIGUSR1 matches the
            # reference's melk: checkpoint and keep training.) Exiting from
            # the handler also stops a run whose main loop is stuck in a
            # long device dispatch from lingering as an orphan.
            raise SystemExit(143)

    def handler(signum, frame):
        if _IN_SAVE:
            # arrived mid-save (same thread): let the in-flight save finish,
            # then checkpoint/exit — re-entering orbax here would collide
            # with the interrupted write and lose the step entirely
            _DEFERRED.append(lambda: action(signum))
            return
        action(signum)

    signal.signal(signal.SIGUSR1, handler)
    signal.signal(signal.SIGTERM, handler)
