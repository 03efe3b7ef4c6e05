"""State checkpointing: pickle save/load keyed by field name.

File-format compatible with the reference (``src/odil/core.py:1389-1436``):
a pickle of ``{"fields": {key: [numpy arrays]}}`` in the canonical array
order of each field.  Improvement over the reference: ``checkpoint_save``
can also record optimizer slot state (Adam moments, L-BFGS memory), which
the reference loses on resume (SURVEY.md §5 "Checkpoint / resume").
"""

import pickle

import numpy as np

from .fields import field_arrays, set_field_arrays

__all__ = ["checkpoint_save", "checkpoint_load"]


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
