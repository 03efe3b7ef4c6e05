"""Backend-free minimal Domain for plotting and post-processing.

Counterpart of the reference ``src/odil/core_min.py`` in role and public
API (constructor keywords, ``points_1d``): carries only geometry -- no
device arrays -- so scripts can replot saved data without a JAX runtime.
The staggered-point formulas must match the full Domain (grid.py) exactly:
cell centers sit half a step past an endpoint-free linspace, nodes are the
closed linspace over ``cshape + 1`` points.
"""

import numpy as np

__all__ = ["Domain"]

_DEFAULTS = dict(lower=0.0, upper=1.0, dimnames=None, dtype=None, cshape=None)


class Domain:

    def __init__(self, domain=None, ndim=None, lower=None, upper=None,
                 dimnames=None, dtype=None, cshape=None):
        # Explicit keywords win; otherwise fall back to the source domain
        # (a full grid.Domain or another core_min.Domain), then defaults.
        given = dict(lower=lower, upper=upper, dimnames=dimnames,
                     dtype=dtype, cshape=cshape)
        for name, value in given.items():
            if value is None:
                value = getattr(domain, name, None) if domain is not None else None
            if value is None:
                value = _DEFAULTS[name]
            given[name] = value

        self.cshape = tuple(int(n) for n in given["cshape"])
        self.ndim = len(self.cshape)
        names = given["dimnames"]
        self.dimnames = list(names) if names else list("xyzw"[: self.ndim])
        self.dtype = given["dtype"]
        self.lower = np.full(self.ndim, given["lower"], dtype=self.dtype)
        self.upper = np.full(self.ndim, given["upper"], dtype=self.dtype)

    def _dim_indices(self, dims):
        if not dims:
            dims = range(self.ndim)
        return tuple(
            self.dimnames.index(d) if isinstance(d, str) else d for d in dims
        )

    def _points_1d(self, d, loc):
        lo, hi, n = self.lower[d], self.upper[d], self.cshape[d]
        if loc == "n":
            return np.linspace(lo, hi, n + 1, dtype=self.dtype)
        if loc != "c":
            raise ValueError(f"Unknown loc={loc}")
        x = np.linspace(lo, hi, n, endpoint=False, dtype=self.dtype)
        return x + (x[1] - x[0]) * 0.5 if n > 1 else x

    def points_1d(self, *dims, loc=None):
        loc = loc or "c" * self.ndim
        axes = [self._points_1d(i, c) for i, c in zip(self._dim_indices(dims), loc)]
        return axes[0] if len(dims) == 1 else axes
