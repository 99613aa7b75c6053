"""Checkpoint save/restore via Orbax.

Parity: reference ``BaseAlgo`` checkpointing (``training/base_algo.py:
40-139``) — save every ``checkpoint_interval`` (100k) steps, keep the last
3, restore the latest on startup, include optimizer state and the logger's
cumulative stats. Improvement over the reference: because env state is just
arrays, the full env batch (boards mid-episode) can be checkpointed too, so
resume continues exactly where training stopped instead of restarting
episodes.

The array pytree goes through Orbax; small metadata (cumulative logger
stats) rides in a JSON sidecar per step, avoiding pytree-structure coupling.
"""

import json
import os

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, logdir, interval=100_000, max_to_keep=3):
        self.logdir = logdir
        self.interval = interval
        self.next_checkpoint = None
        self.path = os.path.join(os.path.abspath(logdir), "checkpoints")
        self.manager = ocp.CheckpointManager(
            self.path, options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def _extra_path(self, step):
        return os.path.join(self.path, "extra-%d.json" % int(step))

    def save(self, step, state, extra=None):
        """Save a pytree ``state`` plus a small ``extra`` metadata dict.

        In multi-host runs every process participates (global arrays are
        saved collectively by Orbax); the metadata sidecar is written by
        host 0 alone.
        """
        self.manager.save(int(step), args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()
        if extra is not None:
            import jax

            if jax.process_index() == 0:
                with open(self._extra_path(step), "w") as f:
                    json.dump(extra, f)

    def save_if_needed(self, step, state, extra=None):
        if self.next_checkpoint is None:
            self.next_checkpoint = (
                int(step) // self.interval + 1) * self.interval
        if int(step) >= self.next_checkpoint:
            self.save(step, state, extra)
            self.next_checkpoint = (
                int(step) // self.interval + 1) * self.interval

    def latest_step(self):
        return self.manager.latest_step()

    def structure(self):
        """Shapes/dtypes of the latest checkpoint, without loading data.

        Returns (nested dict of jax.ShapeDtypeStruct, step), or
        (None, None) when no checkpoint exists. Callers build restore
        templates from what the checkpoint actually stores instead of
        guessing formats and classifying exceptions.
        """
        import jax

        step = self.manager.latest_step()
        if step is None:
            return None, None
        md = ocp.StandardCheckpointer().metadata(
            os.path.join(self.path, str(step), "default"))
        tree = getattr(md, "item_metadata", md)
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree), step

    def restore_raw(self):
        """Restore the latest checkpoint without a template (e.g. for
        eval-only runs). Returns (pytree-of-arrays, step) or (None, None)."""
        step = self.manager.latest_step()
        if step is None:
            return None, None
        return self.manager.restore(step), step

    def restore(self, state_template):
        """Restore the latest checkpoint into the given template pytree.
        Returns (state, extra, step) or (None, None, None)."""
        step = self.manager.latest_step()
        if step is None:
            return None, None, None
        state = self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template))
        extra = None
        if os.path.exists(self._extra_path(step)):
            with open(self._extra_path(step)) as f:
                extra = json.load(f)
        return state, extra, step
