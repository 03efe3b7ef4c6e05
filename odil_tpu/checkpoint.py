"""State checkpointing: pickle save/load keyed by field name.

File-format compatible with the reference (``src/odil/core.py:1389-1436``):
a pickle of ``{"fields": {key: [numpy arrays]}}`` in the canonical array
order of each field.  Improvement over the reference: ``checkpoint_save``
can also record optimizer slot state (Adam moments, L-BFGS memory), which
the reference loses on resume (SURVEY.md §5 "Checkpoint / resume").
"""

import os
import pickle

import numpy as np

from .fields import field_arrays, set_field_arrays

__all__ = ["checkpoint_save", "checkpoint_load", "AsyncCheckpointer"]


def checkpoint_save(domain, state, path, optstate=None):
    """Saves state (and optionally optimizer slot variables) to `path`."""
    fields = dict()
    for key in state.fields:
        fields[key] = [np.asarray(a) for a in field_arrays(state.fields[key])]
    payload = {"fields": fields}
    if optstate is not None:
        payload["optimizer"] = {
            k: [np.asarray(a) for a in v] if isinstance(v, (list, tuple)) else np.asarray(v)
            for k, v in optstate.items()
        }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def checkpoint_load(domain, state, path, skip_missing=True, keys=None):
    """Loads fields from a checkpoint into `state` (in place).

    Returns the optimizer slot dict if present in the checkpoint, else None.
    """
    with open(path, "rb") as f:
        payload = pickle.load(f)
    data = payload.get("fields", dict())
    keys = keys or state.fields.keys()
    for key in keys:
        if key not in data:
            if not skip_missing:
                raise RuntimeError(f"Field {key} not found in {path}")
            continue
        arrays = data[key]
        if not isinstance(arrays, list):
            arrays = [arrays]
        set_field_arrays(state.fields[key], arrays)
    return payload.get("optimizer")


class AsyncCheckpointer:
    """Orbax-backed asynchronous checkpointing (TPU-native alternative to
    the pickle format above; the reference has no async path at all).

    ``save`` returns as soon as the arrays are snapshotted -- serialization
    and disk I/O run on a background thread while training continues, so a
    checkpoint costs ~0 step time.  One numbered subdirectory per step;
    ``restore`` defaults to the latest.  Same payload contract as
    ``checkpoint_save``: field arrays plus optional optimizer slot state.
    Select from the CLI with ``--checkpoint_format orbax``.
    """

    def __init__(self, directory, max_to_keep=None):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, domain, state, step, optstate=None):
        """Starts an async save of `state` (and optimizer slots) at `step`."""
        fields = {
            key: list(field_arrays(state.fields[key])) for key in state.fields
        }
        payload = {"fields": fields}
        if optstate:
            payload["optimizer"] = {
                k: list(v) if isinstance(v, (list, tuple)) else v
                for k, v in optstate.items()
            }
        self._mgr.save(int(step), args=self._ocp.args.StandardSave(payload))

    def restore(self, domain, state, step=None, skip_missing=True):
        """Loads fields into `state` in place from `step` (default latest).

        Returns the optimizer slot dict if present, else None."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise RuntimeError("No checkpoint found to restore")
        payload = self._mgr.restore(int(step))
        data = payload.get("fields", {})
        for key in state.fields:
            if key not in data:
                if not skip_missing:
                    raise RuntimeError(f"Field {key} not found in checkpoint step {step}")
                continue
            set_field_arrays(state.fields[key], list(data[key]))
        return payload.get("optimizer")

    def latest_step(self):
        return self._mgr.latest_step()

    def wait(self):
        """Blocks until all in-flight async saves are durable on disk."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
