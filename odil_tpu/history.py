"""Training history: typed scalar columns streamed to CSV + pickle resume.

Counterpart of reference ``src/odil/history.py``: columns are appended per
entry, the CSV header freezes after ``warmup`` entries, unknown late columns
raise, and pickles allow checkpoint/resume of the full history.
"""

import pickle

import numpy as np

__all__ = ["History"]


class History:

    def __init__(self, csvpath=None, warmup=0):
        """
        warmup: write to CSV only once more than `warmup` entries exist,
        letting late-appearing columns join before the header freezes.
        """
        self.data = dict()
        self.count = 0
        self.warmup = warmup
        self.csvpath = csvpath
        self.csvcount = 0
        self.csvkeys = None
        self.csvfile = open(csvpath, "w") if csvpath is not None else None

    @staticmethod
    def _filler(value):
        if value is None:
            return None
        if isinstance(value, (float, np.floating)):
            return 0.0
        if isinstance(value, int):
            return 0
        raise ValueError("Unknown type: " + str(type(value)))

    def append(self, key, value=None):
        assert value is None or isinstance(
            value, (int, float, str, np.floating, np.ndarray)
        ), "Unexpected type: " + str(type(value))
        if isinstance(value, np.ndarray):
            assert value.shape == (1,) or value.ndim == 0
            value = value.item()
        if key not in self.data:
            assert value is not None
            self.data[key] = [self._filler(value)] * self.count
        if value is None:
            assert len(self.data[key]) > 0, "Expected non-empty column " + key
            value = self._filler(self.data[key][-1])
        self.data[key].append(value)

    def append_dict(self, entries):
        for k, v in entries.items():
            self.append(k, v)

    def commit(self):
        """Finishes the current entry; every column must have a value."""
        maxlen = max(len(v) for v in self.data.values())
        missing = [k for k, v in self.data.items() if len(v) < maxlen]
        if missing:
            raise RuntimeError("Missing values for columns: " + ",".join(missing))
        self.count += 1

    def get(self, key, default=None):
        return self.data.get(key, default)

    def write(self, nocommit=False):
        if not nocommit:
            self.commit()
        if self.count <= self.warmup or self.csvfile is None:
            return
        if self.csvkeys is not None and len(self.data) != len(self.csvkeys):
            newkeys = sorted(set(self.data) - set(self.csvkeys))
            raise RuntimeError(f"Unexpected keys in history: {newkeys}")
        if self.csvcount == 0:
            self.csvkeys = list(self.data.keys())
            self.csvfile.write(",".join(self.csvkeys) + "\n")
        while self.csvcount < self.count:
            row = [self.data[k][self.csvcount] for k in self.data]
            self.csvfile.write(",".join(map(str, row)) + "\n")
            self.csvcount += 1
        self.csvfile.flush()

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self.data, f)

    def load(self, path):
        with open(path, "rb") as f:
            self.data = pickle.load(f)
        self.csvkeys = list(self.data.keys())
        self.count = len(next(iter(self.data.values())))
        self.write(nocommit=True)

    def close(self):
        if self.csvfile:
            self.csvfile.close()
