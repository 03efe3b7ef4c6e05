"""The bundled `odil` alias package must serve reference-style scripts."""

import numpy as np


def test_reference_style_flow_through_alias():
    import odil
    from odil import Array, Field

    domain = odil.Domain(cshape=(8, 4), dimnames=["x", "y"], multigrid=1)
    state = odil.State(
        fields={
            "uc": Field(np.zeros(domain.size(loc="cc")), loc="cc"),
            "a": Array(np.zeros(3)),
        }
    )
    state = domain.init_state(state)

    def operator(ctx):
        return [("uc", ctx.field("uc") - 1.0), ("a", ctx.field("a") - 2.0)]

    problem = odil.Problem(operator, domain)
    loss, grads, terms, names, norms = problem.eval_loss_grad(state)
    assert names == ["uc", "a"]
    # Reference-style submodule access.
    assert odil.core.extrap_linear(0.0, 1.0) == 2.0
    assert callable(odil.util.optimize)
    assert callable(odil.linsolver.solve)
    assert hasattr(odil.runtime, "mod")
    assert callable(odil.optimizer.make_optimizer)
