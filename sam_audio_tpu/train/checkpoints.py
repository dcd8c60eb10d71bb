"""Training checkpoint management: periodic TrainState snapshots with
retention policies, built on orbax's CheckpointManager.

The reference is inference-only (its checkpoints are one-shot HF snapshots,
sam_audio/model/base.py:56-61); a trainer needs rolling step checkpoints
with bounded disk use. Retention mirrors the standard policy pair:

  * `max_to_keep`    — keep only the most recent N step checkpoints;
  * `keep_period`    — additionally keep every checkpoint whose step is a
                       multiple of this (survives max_to_keep pruning), for
                       long-horizon rollback / eval sweeps.

Saves are multi-host safe and sharding-preserving (orbax records array
shardings; restore with a template from the live mesh puts leaves back on
their devices — see tests/test_orbax_multidevice.py for the round-trips).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sam_audio_tpu.train.flow_matching import TrainState


def _abstract(tree):
    # Keep the template's shardings (a live-mesh TrainState): without them
    # orbax falls back to the shardings recorded at SAVE time, which
    # reference the old device set — restoring onto a different topology
    # (tp=4 -> tp=2, fewer chips) would fail or place 1B-model leaves
    # unsharded. Same pattern as tests/test_orbax_multidevice.py.
    def leaf(x):
        return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x),
                                    sharding=getattr(x, "sharding", None))

    return jax.tree_util.tree_map(leaf, tree)


class TrainCheckpointManager:
    """Rolling TrainState checkpoints under `directory/<step>/`."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = 3,
                 keep_period: Optional[int] = None,
                 save_interval_steps: int = 1):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        import os

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                keep_period=keep_period,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    # -- write ---------------------------------------------------------------

    def save(self, state: TrainState, force: bool = False) -> bool:
        """Save at state.step (subject to save_interval_steps unless forced).
        Returns True if a checkpoint was written. Idempotent: a step already
        on disk is skipped even under force (orbax raises otherwise)."""
        step = int(state.step)
        if step in self._mgr.all_steps():
            return False
        saved = self._mgr.save(
            step,
            args=self._ocp.args.StandardSave(state._asdict()),
            force=force,
        )
        return bool(saved)

    # -- read ----------------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure (and shardings) of `template` — pass a
        freshly-initialized TrainState from the live Trainer/mesh."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoints found")
        restored = self._mgr.restore(
            step,
            args=self._ocp.args.StandardRestore(_abstract(template._asdict())),
        )
        return TrainState(**restored)

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
