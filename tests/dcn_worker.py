"""One JAX process of the 2-process multi-host (DCN) validation run.

Launched by tests/test_distributed.py: each process owns 4 virtual CPU
devices, connects through the JAX coordination service (the DCN control
plane, SURVEY.md §5 "Distributed communication backend"), and runs the
flagship veltracer sharded over a mesh spanning BOTH processes — cross-
process collectives ride the gloo CPU backend, standing in for ICI/DCN.
Checks that the GSPMD path and the halo+fused-kernel path reproduce the
fully-replicated evaluation bit-for-bit-ish (1e-12).

Usage: python dcn_worker.py <process_id> <num_processes> <port>
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from odil_tpu import parallel

    parallel.init_distributed(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.device_count() == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np

    from odil_tpu.halo import make_halo_loss_fn
    from odil_tpu.models import veltracer as vt

    kw = dict(nt=16, nx=16, ny=16, multigrid=True, dtype=np.float64)

    def eval_loss_gradnorm(loss_fn, arrays, tracers):
        def scalar(a, t):
            return loss_fn(a, t)[0]

        f = jax.jit(jax.value_and_grad(scalar))
        loss, grads = f(arrays, tracers)
        gnorm = jax.jit(lambda g: sum(jax.numpy.sum(jax.numpy.abs(x)) for x in g))(grads)
        return float(loss), float(gnorm)

    # Reference: fully replicated (no mesh) evaluations of both operators.
    pr_x, st_x, _ = vt.build(kernel="xla", **kw)
    fn, arrays = pr_x.make_loss_fn(st_x)
    ref_xla = eval_loss_gradnorm(fn, arrays, pr_x.tracers)
    pr_k, st_k, _ = vt.build(kernel="pallas", **kw)
    fn, arrays = pr_k.make_loss_fn(st_k)
    ref_kern = eval_loss_gradnorm(fn, arrays, pr_k.tracers)

    # Sharded over a (t=2, x=4) mesh spanning both processes.
    mesh = parallel.mesh_from_spec("t:2,x:4")
    part = {"t": "t", "x": "x"}
    pr_g, st_g, _ = vt.build(kernel="xla", mesh=mesh, partition=part, **kw)
    fn, arrays = pr_g.make_loss_fn(st_g)
    gspmd = eval_loss_gradnorm(fn, arrays, pr_g.tracers)

    pr_h, st_h, _ = vt.build(kernel="pallas", mesh=mesh, partition=part, **kw)
    fn, arrays = make_halo_loss_fn(pr_h, st_h)
    halo = eval_loss_gradnorm(fn, arrays, pr_h.tracers)

    for name, got, ref in (("gspmd", gspmd, ref_xla), ("halo+kernel", halo, ref_kern)):
        for a, b in zip(got, ref):
            assert abs(a - b) <= 1e-12 * max(1.0, abs(b)), (name, got, ref)
    print(f"DCN_OK pid={pid} gspmd={gspmd!r} halo={halo!r}", flush=True)


if __name__ == "__main__":
    main()
