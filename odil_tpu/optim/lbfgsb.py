"""Host L-BFGS-B via scipy -- numerics-parity escape hatch.

Kept for exact behavioral parity with the reference's default second-order
optimizer (``src/odil/optimizer.py:29-117``): flattens the state to one
float64 host vector and drives ``scipy.optimize.fmin_l_bfgs_b``.  Every
iteration crosses the host-device boundary, so for production TPU runs use
``lbfgs`` (device-resident) instead.
"""

from argparse import Namespace

import numpy as np

from .base import EarlyStopError, Optimizer

__all__ = ["LbfgsbOptimizer"]


class LbfgsbOptimizer(Optimizer):

    def __init__(self, pgtol=1e-16, m=50, maxls=50, factr=0, dtype=None, mod=None, **kwargs):
        super().__init__(name="lbfgsb", displayname="L-BFGS-B", dtype=dtype, mod=mod)
        self.pgtol = pgtol if pgtol is not None else 1e-16
        self.m = m
        self.maxls = maxls
        self.factr = factr
        self.epoch = 0

    def run(self, x0, loss_grad=None, epochs=None, callback=None, epoch_start=0, **kwargs):
        from scipy import optimize

        self.epoch = epoch_start
        shapes = [tuple(np.shape(a)) for a in x0]
        sizes = [int(np.prod(s)) for s in shapes]
        bounds = np.cumsum(sizes)[:-1]
        dtype = self.dtype

        def to_arrays(flat):
            parts = np.split(np.asarray(flat, dtype=dtype), bounds)
            return [p.reshape(s) for p, s in zip(parts, shapes)]

        def to_flat(arrays):
            return np.concatenate([np.asarray(a, dtype=np.float64).reshape(-1) for a in arrays])

        def objective(flat):
            self.evals += 1
            loss, grads, pinfo = loss_grad(to_arrays(flat))
            self.pinfo = pinfo
            return np.asarray(loss, dtype=np.float64), to_flat(grads)

        def iteration_callback(flat):
            self.epoch += 1
            if callback:
                callback(to_arrays(flat), self.epoch, self.pinfo)

        x, f, sinfo = optimize.fmin_l_bfgs_b(
            func=objective,
            x0=to_flat(x0),
            maxiter=epochs,
            pgtol=self.pgtol,
            m=self.m,
            maxls=self.maxls,
            factr=self.factr,
            maxfun=np.inf,
            callback=iteration_callback,
        )
        optinfo = Namespace(
            warnflag=sinfo["warnflag"],
            task=sinfo["task"],
            evals=sinfo["funcalls"],
            epochs=sinfo["nit"],
        )
        if optinfo.warnflag not in (0, 1) or optinfo.epochs < epochs:
            detail = ", ".join(f"{k}={sinfo.get(k, '')}" for k in ("warnflag", "task", "funcalls", "nit"))
            raise EarlyStopError(detail, optinfo)
        return to_arrays(x), optinfo
