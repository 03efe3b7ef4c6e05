"""Training history: scalar metrics collected per epoch, streamed to CSV.

Same external contract as the reference's column store
(``src/odil/history.py``): one ``train.csv`` with a header that freezes
after ``warmup`` entries, zero-backfill for columns that appear late,
errors on columns appearing after the freeze, and a ``{column: [values]}``
pickle for checkpoint/resume.  The implementation is row-oriented instead:
metrics accumulate into a pending-row dict, ``commit`` seals it against the
column registry, and a small CSV sink tracks what still needs flushing.
"""

import pickle

import numpy as np

__all__ = ["History"]

_SCALARS = (int, float, str, np.floating)


def _zero_of(value):
    """The backfill/placeholder value matching a recorded value's type."""
    if value is None:
        return None
    if isinstance(value, bool) or not isinstance(value, (int, float, np.floating)):
        raise ValueError("Unknown type: " + str(type(value)))
    return 0 if isinstance(value, int) else 0.0


class _CsvSink:
    """Streams committed rows to a CSV file, freezing the column set at the
    first written row."""

    def __init__(self, path):
        self.file = open(path, "w") if path is not None else None
        self.header = None  # Frozen column order, or None before first write.
        self.nwritten = 0

    def flush(self, data, count):
        """Writes rows [nwritten, count) of the columnar view `data`."""
        if self.file is None:
            return
        if self.header is None:
            self.header = list(data)
            self.file.write(",".join(self.header) + "\n")
        elif len(data) != len(self.header):
            extra = sorted(set(data) - set(self.header))
            raise RuntimeError(f"Unexpected keys in history: {extra}")
        while self.nwritten < count:
            i = self.nwritten
            self.file.write(",".join(str(data[k][i]) for k in self.header) + "\n")
            self.nwritten += 1
        self.file.flush()

    def close(self):
        if self.file is not None:
            self.file.close()


class History:

    def __init__(self, csvpath=None, warmup=0):
        """
        warmup: hold the first `warmup` entries back from the CSV, so
        columns that only appear from the second entry on (per-example
        extras) still make it into the header.
        """
        self._rows = []  # Committed entries, each a {column: value} dict.
        self._pending = {}  # The entry being assembled by append() calls.
        self._born = {}  # column -> index of the row where it first appeared.
        self.warmup = warmup
        self.csvpath = csvpath
        self._sink = _CsvSink(csvpath)

    # -- Recording -----------------------------------------------------------

    def append(self, key, value=None):
        """Records one metric of the current entry.  value=None writes a
        zero of the column's type (the reference's placeholder idiom)."""
        if isinstance(value, np.ndarray):
            assert value.shape == (1,) or value.ndim == 0
            value = value.item()
        assert value is None or isinstance(value, _SCALARS), (
            "Unexpected type: " + str(type(value))
        )
        if key not in self._born:
            assert value is not None, f"First value for column '{key}' must be set"
            self._born[key] = len(self._rows)
        if value is None:
            last = self._pending.get(key)
            if last is None:
                for row in reversed(self._rows):
                    if key in row:
                        last = row[key]
                        break
            assert last is not None, "Expected non-empty column " + key
            value = _zero_of(last)
        self._pending[key] = value

    def append_dict(self, entries):
        for k, v in entries.items():
            self.append(k, v)

    def commit(self):
        """Seals the pending entry: every registered column must be set."""
        missing = [k for k in self._born if k not in self._pending]
        if missing:
            raise RuntimeError("Missing values for columns: " + ",".join(missing))
        self._rows.append(self._pending)
        self._pending = {}

    # -- Access --------------------------------------------------------------

    @property
    def count(self):
        return len(self._rows)

    @property
    def data(self):
        """Columnar {key: [values]} view (the reference's native layout),
        zero-backfilled before each column's first appearance."""
        out = {}
        for key, born in self._born.items():
            zero = None
            for row in self._rows[born:]:
                if key in row:
                    zero = _zero_of(row[key])
                    break
            out[key] = [row.get(key, zero) for row in self._rows]
        return out

    def get(self, key, default=None):
        if key not in self._born:
            return default
        return self.data[key]

    # -- Output --------------------------------------------------------------

    def write(self, nocommit=False):
        if not nocommit:
            self.commit()
        if self.count <= self.warmup:
            return
        self._sink.flush(self.data, self.count)

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self.data, f)

    def load(self, path):
        """Replaces the history with a pickled columnar dump (resume)."""
        with open(path, "rb") as f:
            columns = pickle.load(f)
        counts = {len(v) for v in columns.values()}
        assert len(counts) == 1, f"Ragged history columns: {counts}"
        self._born = {k: 0 for k in columns}
        n = counts.pop()
        self._rows = [{k: columns[k][i] for k in columns} for i in range(n)]
        self._pending = {}
        self.write(nocommit=True)

    def close(self):
        self._sink.close()
