"""SPMD execution over a TPU device mesh.

The unit of parallelism in ODIL is the structured grid itself, so the
natural mapping is spatial domain decomposition: every Field array carries a
``NamedSharding`` over a ``jax.sharding.Mesh`` and the XLA SPMD partitioner
compiles stencil ``roll``s into ICI collective-permutes (halo exchanges) and
loss ``mean``s into psums (SURVEY.md §2.3).  The reference has no
distributed execution at all (``src/odil/runtime.py:8-16`` pins one thread).

Usage:
    mesh = parallel.make_mesh("x:2,y:4")            # or dict / tuple spec
    domain = Domain(cshape, mesh=mesh, partition={"x": "x", "y": "y"})

Multi-host: call ``parallel.init_distributed()`` once per process before
creating the mesh; the mesh then spans all connected hosts over DCN.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "mesh_from_spec",
    "auto_partition",
    "init_distributed",
    "device_count",
]


def device_count():
    return jax.device_count()


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initializes multi-host JAX (DCN).  No-op for a single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def mesh_from_spec(spec, devices=None):
    """Builds a Mesh from a spec like "x:2,y:4", {"x": 2, "y": 4}, or
    [("x", 2), ("y", 4)].  Axis sizes must multiply to <= device count;
    a size of -1 takes all remaining devices."""
    if isinstance(spec, str):
        pairs = []
        for part in spec.split(","):
            name, _, size = part.partition(":")
            pairs.append((name.strip(), int(size) if size else -1))
    elif isinstance(spec, dict):
        pairs = list(spec.items())
    else:
        pairs = [tuple(p) for p in spec]

    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    known = int(np.prod([s for _, s in pairs if s != -1]))
    pairs = [(n, s if s != -1 else max(1, total // known)) for n, s in pairs]
    shape = tuple(s for _, s in pairs)
    names = tuple(n for n, _ in pairs)
    count = int(np.prod(shape))
    assert count <= total, f"Mesh {dict(pairs)} needs {count} devices, have {total}"
    grid = np.array(devices[:count]).reshape(shape)
    return Mesh(grid, names)


def make_mesh(spec=None, devices=None):
    """Convenience: default spec shards all devices along one axis 'x'."""
    if spec is None:
        spec = f"x:{len(devices) if devices is not None else jax.device_count()}"
    return mesh_from_spec(spec, devices)


def auto_partition(domain_dimnames, mesh):
    """Maps grid dimension names onto mesh axis names by name match, e.g.
    dimnames ('t','x','y') with mesh axes ('x','y') -> {'x':'x','y':'y'}."""
    names = set(mesh.axis_names)
    return {d: d for d in domain_dimnames if d in names}


def shard_state_arrays(domain, arrays):
    """Re-places grid-shaped arrays in `arrays` with the domain sharding.

    Per-array shapes matter: staggered '+1 node' axes and coarse multigrid
    levels that do not divide the mesh axis are replicated along that axis
    (Domain.field_sharding handles the per-shape downgrade)."""
    if domain.mesh is None or not domain.partition:
        return arrays
    out = []
    for a in arrays:
        if a.ndim == domain.ndim:
            sharding = domain.field_sharding(shape=tuple(a.shape))
            out.append(jax.device_put(a, sharding))
        else:
            out.append(a)
    return out


def replicated(mesh):
    """Fully-replicated sharding on `mesh` (for scalars/small params)."""
    return NamedSharding(mesh, PartitionSpec())


def multi_start(
    problem, state, nstarts, seed=0, scale=1.0, mesh=None, batch_axis=None, per_instance=None
):
    """Data parallelism over independent problem instances (SURVEY §2.3):
    batches `nstarts` optimization starts of the same problem along a
    leading instance axis.

    Returns (loss_fn_b, stacked_arrays): loss_fn_b has the standard
    (arrays, tracers) -> (loss, (terms, norms)) signature with the batch
    mean reduced, so it binds directly into the existing scanned optimizers
    (their elementwise updates act per instance).  Starts are the current
    state plus Gaussian perturbations of magnitude `scale` (start 0 is
    unperturbed).  With `mesh` and `batch_axis`, the instance axis is
    sharded across devices -- one training run per device group.

    per_instance: optional {field_name: array of shape (nstarts, *field)}
    giving each instance its own value of that unknown -- the idiom for
    batched inverse problems with per-instance measurement data (store the
    data in a `frozen` Field and override it here).  Only single-array
    fields (Field/Array) can be overridden."""
    import jax.numpy as jnp

    from .fields import field_arrays

    loss_fn, arrays = problem.make_loss_fn(state)
    # Map state field names to positions in the packed array list.
    index_of = {}
    pos = 0
    for name, fobj in state.fields.items():
        n = len(field_arrays(fobj))
        index_of[name] = (pos, n)
        pos += n
    overrides = {}
    for name, value in (per_instance or {}).items():
        if name not in index_of:
            raise KeyError(f"per_instance: unknown field '{name}'")
        start, n = index_of[name]
        if n != 1:
            raise ValueError(
                f"per_instance: field '{name}' has {n} arrays (multigrid/NN); "
                "only single-array fields can be overridden"
            )
        value = jnp.asarray(value)
        if value.shape[0] != nstarts:
            raise ValueError(
                f"per_instance['{name}']: leading dim {value.shape[0]} != nstarts {nstarts}"
            )
        overrides[start] = value

    key = jax.random.PRNGKey(seed)
    stacked = []
    for i, a in enumerate(arrays):
        a = jnp.asarray(a)
        if i in overrides:
            batched = overrides[i].astype(a.dtype)
            if batched.shape[1:] != a.shape:
                raise ValueError(
                    f"per_instance array {batched.shape[1:]} != field shape {a.shape}"
                )
        else:
            key, sub = jax.random.split(key)
            noise = scale * jax.random.normal(sub, (nstarts,) + a.shape, a.dtype)
            noise = noise.at[0].set(0.0)
            batched = a[None] + noise
        if mesh is not None and batch_axis is not None:
            spec = PartitionSpec(batch_axis, *([None] * a.ndim))
            batched = jax.device_put(batched, NamedSharding(mesh, spec))
        stacked.append(batched)

    def loss_fn_b(arrays_b, tracers):
        losses, (terms, norms) = jax.vmap(lambda a: loss_fn(a, tracers))(arrays_b)
        mean = lambda t: jnp.mean(t, axis=0)  # noqa: E731
        return jnp.mean(losses), (
            [mean(t) for t in terms],
            [mean(n) for n in norms],
        )

    return loss_fn_b, stacked
