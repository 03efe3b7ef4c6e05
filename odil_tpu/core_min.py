"""Backend-free minimal Domain for plotting and post-processing.

Counterpart of the reference ``src/odil/core_min.py``: carries only geometry
(no device arrays), so scripts can replot saved data without a JAX runtime.
"""

from argparse import Namespace

import numpy as np

__all__ = ["Domain"]


class Domain:

    def __init__(self, domain=None, ndim=None, lower=None, upper=None, dimnames=None, dtype=None, cshape=None):
        src = domain or Namespace(ndim=None, lower=0.0, upper=1.0, dimnames=None, dtype=None, cshape=None)
        dtype = dtype or src.dtype
        cshape = cshape or src.cshape
        dimnames = dimnames or src.dimnames
        lower = lower if lower is not None else src.lower
        upper = upper if upper is not None else src.upper
        ndim = len(cshape)
        self.ndim = ndim
        self.cshape = tuple(int(n) for n in cshape)
        self.dimnames = list(dimnames) if dimnames else ["x", "y", "z", "w"][:ndim]
        self.dtype = dtype
        self.lower = (np.ones(ndim, dtype=dtype) * lower).astype(dtype)
        self.upper = (np.ones(ndim, dtype=dtype) * upper).astype(dtype)

    def _dim_indices(self, dims):
        res = dims if dims is not None and len(dims) else range(len(self.dimnames))
        return tuple(self.dimnames.index(d) if isinstance(d, str) else d for d in res)

    def _points_1d(self, d, loc):
        if loc == "c":
            x = np.linspace(self.lower[d], self.upper[d], self.cshape[d], endpoint=False, dtype=self.dtype)
            if len(x) > 1:
                x = x + (x[1] - x[0]) * 0.5
            return x
        if loc == "n":
            return np.linspace(self.lower[d], self.upper[d], self.cshape[d] + 1, dtype=self.dtype)
        raise ValueError("Unknown loc=" + loc)

    def points_1d(self, *dims, loc=None):
        loc = loc or "c" * self.ndim
        idims = self._dim_indices(dims)
        res = [self._points_1d(i, c) for i, c in zip(idims, loc)]
        return res[0] if len(dims) == 1 else res
