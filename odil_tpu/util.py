"""Training harness: flag registry, output-dir setup, optimize dispatch, and
the periodic-callback engine (report / history / plot / checkpoint).

Counterpart of reference ``src/odil/util.py``.  Key TPU-native difference:
``optimize_grad`` hands the optimizer a *pure* device loss function plus the
schedule of "task epochs" (epochs where the callback has actual work), so
whole stretches of epochs run inside one compiled ``lax.scan`` with zero
host synchronization in between.  Reports include the Mcells/s throughput
north-star metric (reference ``util.py:408-419``).
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np

from .history import History
from .optim import EarlyStopError, Optimizer, make_optimizer

class _LogSink:
    """Destination of :func:`printlog`: a primary stream, optionally echoed
    to stderr when the primary stream is a file (``--echo``)."""

    def __init__(self):
        self.stream = sys.stderr
        self.echo = False

    def emit(self, text):
        if self.echo and self.stream is not sys.stderr:
            sys.stderr.write(text)
            sys.stderr.flush()
        self.stream.write(text)
        self.stream.flush()


_log_sink = _LogSink()


def assert_equal(first, second, msg=""):
    if not first == second:
        raise ValueError(f"mismatch: {first!r} != {second!r}{msg}")


def set_log_file(f=None, echo=None):
    """Redirects :func:`printlog` (reference contract ``util.set_log_file``);
    either argument may be omitted to leave it unchanged."""
    if f is not None:
        _log_sink.stream = f
    if echo is not None:
        _log_sink.echo = echo


def printlog(*msg):
    _log_sink.emit(" ".join(str(m) for m in msg) + "\n")


class Timer:
    """Nested wall-clock accumulator: ``push()`` opens a span, ``pop()``
    closes the innermost open span and adds its duration to
    ``counters[label]``.  The label may be given at either end (or both, in
    which case they must agree)."""

    def __init__(self):
        self.counters = {}
        self._open = []

    def push(self, key=None):
        self._open.append((key, time.perf_counter()))

    def pop(self, key=None):
        opened_as, t0 = self._open.pop()
        if opened_as is not None and key is not None and opened_as != key:
            raise ValueError(f"Timer span opened as {opened_as!r}, closed as {key!r}")
        label = key if opened_as is None else opened_as
        self.counters[label] = self.counters.get(label, 0.0) + (time.perf_counter() - t0)

    def append(self, timer):
        for label, dt in timer.counters.items():
            self.counters[label] = self.counters.get(label, 0.0) + dt


def get_error(u, v):
    diff = np.asarray(u) - np.asarray(v)
    return np.mean(abs(diff)), np.sqrt(np.mean(diff**2)), np.max(abs(diff))


# ---------------------------------------------------------------------------
# Flags.
# ---------------------------------------------------------------------------


def add_arguments(parser):
    """Registers the standard training/output flags (reference parity:
    ``src/odil/util.py:70-149``) plus TPU-specific additions."""
    add = parser.add_argument
    add("--epochs", type=int, default=None, help="Maximum epochs, defaults to plot_every * frames")
    add("--every_factor", type=float, default=1, help="Multiplier for all *_every options")
    add("--plot_every", type=int, default=5, help="Epochs between plots")
    add("--report_every", type=int, default=10, help="Epochs between reports to stdout")
    add("--history_every", type=int, default=1, help="Epochs between history entries")
    add("--checkpoint_every", type=int, default=0, help="Epochs between checkpoints")
    add(
        "--checkpoint_format",
        type=str,
        default="pickle",
        choices=["pickle", "orbax"],
        help="Checkpoint backend: reference-compatible pickle, or Orbax "
        "async (background-thread save, zero step-time cost)",
    )
    add("--frames", type=int, default=10, help="Frames to plot. Zero disables first frame.")
    add("--outdir", type=str, default=".", help="Output directory")
    add("--optimizer", type=str, default="adamn", help="Optimizer")
    add("--seed", default=1000, type=int, help="Seed for numpy.random and the backend RNG")
    add("--plot_title", type=int, default=0, help="Enable title in plots")
    add("--plotext", type=str, default="pdf", help="Extension of plots")
    add("--history_full", type=int, default=0, help="Number of initial epochs with history at every epoch")
    add("--montage", type=int, default=1, help="Run montage after plotting")
    add("--double", type=int, default=None, help="Double precision. Defaults to runtime.dtype")
    add("--echo", type=int, default=0, help="Echo log to stderr")
    add("--epoch_start", type=int, default=0, help="Initial value of epoch")
    add("--frame_start", type=int, default=0, help="Initial value of frame")
    add("--checkpoint", type=str, help="Continue from checkpoint in state_*.pickle")
    add(
        "--checkpoint_train",
        type=str,
        help="Continue from history in state_*_train.pickle; inferred from --checkpoint by default",
    )
    add("--callback_update_state", type=int, default=0, help="Update state after callback")
    add("--bfgs_m", type=int, default=50, help="History size for L-BFGS")
    add("--bfgs_maxls", type=int, default=50, help="Max evaluations in line search")
    add("--bfgs_pgtol", type=float, default=None, help="Convergence tolerance for L-BFGS")
    add("--adam_epsilon", type=float, help="Parameter epsilon in Adam")
    add("--adam_beta_1", type=float, help="Parameter beta_1 in Adam")
    add("--adam_beta_2", type=float, help="Parameter beta_2 in Adam")
    add(
        "--adam_slot_dtype",
        type=str,
        default=None,
        choices=["bfloat16", "float32"],
        help="Storage dtype for Adam moment slots (bfloat16 halves their HBM traffic)",
    )
    add("--multigrid", type=int, default=0, help="Use multigrid decomposition")
    add(
        "--mg_interp",
        type=str,
        default="stack",
        choices=["conv", "stack"],
        help="Multigrid interpolation method (both run the separable TPU kernel)",
    )
    add("--dump_data", type=int, default=1, help="Dump data_*.pickle with every plot")
    add("--nn_initializer", type=str, default="legacy", choices=["legacy", "glorot", "lecun", "he"])
    # TPU-native additions.
    add("--max_chunk", type=int, default=512, help="Max epochs per on-device scan chunk")
    add("--mesh", type=str, default=None, help="Device mesh spec, e.g. 'x:2,y:4' (dim:size pairs)")
    add("--halo", type=int, default=0, help="Evaluate the loss inside shard_map with explicit ppermute halo exchange (requires --mesh)")
    add("--halo_fuse", type=str, default=None, choices=["generic", "mg"], help="Per-shard one-pass route under --halo: generic (default; deferred-kernel replay, measured faster) or mg (reconstruction inside the kernel)")
    add("--profile_dir", type=str, default=None, help="Capture a jax.profiler trace into this dir")
    # Reference flags kept for CLI compatibility (consumed by examples).
    add("--jac_nsmp0", type=int, default=50, help=argparse.SUPPRESS)
    add("--jac_nsmp1", type=int, default=1, help=argparse.SUPPRESS)
    add("--jac_factor", type=float, default=1, help=argparse.SUPPRESS)
    add("--jac_epsilon", type=float, default=1e-8, help=argparse.SUPPRESS)


# ---------------------------------------------------------------------------
# Optimization drivers.
# ---------------------------------------------------------------------------


def _pinfo_from(loss, terms, names, norms):
    return {"terms": terms, "names": names, "norms": norms, "loss": loss}


def compute_task_epochs(args, epoch_start, epochs):
    """Absolute epochs in (epoch_start, epoch_start+epochs] where the
    callback engine has work to do (mirrors the gating in make_callback)."""
    cadences = []
    for name in ("report_every", "history_every", "plot_every", "checkpoint_every"):
        v = getattr(args, name, 0)
        if v:
            cadences.append(v)
    history_full = getattr(args, "history_full", 0) or 0
    out = set()
    for e in range(epoch_start + 1, epoch_start + epochs + 1):
        if e < history_full and getattr(args, "history_every", 0):
            out.add(e)
        for c in cadences:
            if e % c == 0:
                out.add(e)
    out.add(epoch_start + epochs)  # Always sync at the end.
    return sorted(out)


def optimize_grad(args, optname, problem, state, callback=None, **kwargs):
    """Gradient-based optimization of `problem` over `state` (in place)."""
    domain = problem.domain
    mod = domain.mod

    def loss_grad(arrays):
        domain.arrays_to_state(arrays, state)
        loss, grads, terms, names, norms = problem.eval_loss_grad(state)
        return loss, grads, _pinfo_from(loss, terms, names, norms)

    def callback_wrap(arrays, epoch, pinfo):
        domain.arrays_to_state(arrays, state)
        callback(state, epoch, pinfo)
        if getattr(args, "callback_update_state", 0):
            new = domain.arrays_from_state(state)
            for i in range(len(new)):
                arrays[i] = new[i]

    for flag, key in (
        ("bfgs_m", "m"),
        ("bfgs_pgtol", "pgtol"),
        ("bfgs_maxls", "maxls"),
        ("adam_epsilon", "epsilon"),
        ("adam_beta_1", "beta_1"),
        ("adam_beta_2", "beta_2"),
    ):
        v = getattr(args, flag, None)
        if v is not None:
            kwargs[key] = v
    if getattr(args, "adam_slot_dtype", None):
        import jax.numpy as jnp

        kwargs["slot_dtype"] = jnp.dtype(args.adam_slot_dtype)

    opt = make_optimizer(optname, dtype=domain.dtype, mod=mod, **kwargs)
    printlog(f"Running {opt.displayname} optimizer")
    # Expose the active optimizer so checkpoints can include slot state, and
    # resume slot state loaded by the caller (problem.resume_opt_state).
    problem._active_optimizer = opt
    resume_slots = getattr(problem, "resume_opt_state", None)
    if resume_slots is not None:
        kwargs["init_slots"] = resume_slots
        printlog("Resuming optimizer slot state from checkpoint")

    # Initial evaluation, reported through the callback at epoch_start.
    loss_fn, arrays = problem.make_loss_fn(state, halo=bool(getattr(args, "halo", 0)))
    loss, grads, terms, names, norms = problem.eval_loss_grad(state)
    pinfo = _pinfo_from(loss, terms, names, norms)
    if callback:
        callback(state, args.epoch_start, pinfo)

    # Callback schedule: dense if the callback needs every epoch.
    every_epoch = getattr(callback, "every_epoch", callback is not None and not hasattr(callback, "cbinfo"))
    if getattr(args, "callback_update_state", 0):
        every_epoch = True
    epochs = args.epochs - args.epoch_start
    task_epochs = None if every_epoch else compute_task_epochs(args, args.epoch_start, epochs)
    # Fused one-pass loss+grad (skips the forward kernel) when the operator
    # provides it; under --halo the shard_map form runs the one-pass kernel
    # per device shard (halo.make_halo_loss_grad_fn; None falls back to
    # value_and_grad of the halo loss_fn).
    loss_grad_fn = problem.make_loss_grad_fn(
        state, halo=bool(getattr(args, "halo", 0)),
        halo_fuse=getattr(args, "halo_fuse", None),
    )
    opt.bind(
        loss_fn,
        tracers=problem.tracers,
        task_epochs=task_epochs,
        names=names,
        max_chunk=getattr(args, "max_chunk", 512) or 512,
        loss_grad_fn=loss_grad_fn,
    )

    profile_dir = getattr(args, "profile_dir", None)
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
    try:
        arrays, optinfo = opt.run(
            arrays,
            loss_grad=loss_grad,
            epochs=epochs,
            callback=callback_wrap if callback else None,
            epoch_start=args.epoch_start,
            lr=args.lr,
            **kwargs,
        )
    finally:
        if profile_dir:
            import jax

            jax.profiler.stop_trace()
            printlog(f"profiler trace written to {profile_dir}")
    domain.arrays_to_state(arrays, state)
    return arrays, optinfo


def optimize_newton(args, problem, state, callback=None, **kwargs):
    """Newton's method: linearize -> sparse solve -> update, per epoch.
    See newton.py for the matrix-free Gauss-Newton variant."""
    from .linsolver import solve

    domain = problem.domain

    def eval_pinfo(state):
        loss, _, terms, names, norms = problem.eval_loss_grad(state)
        return _pinfo_from(loss, terms, names, norms)

    opt = Optimizer(name="newton", displayname="Newton")
    printlog(f"Running {opt.displayname} optimizer")

    pinfo = eval_pinfo(state)
    if callback:
        callback(state, args.epoch_start, pinfo)

    for epoch in range(args.epoch_start, args.epochs):
        vector, matrix = problem.linearize(state)
        opt.evals += 1
        linstatus = dict()
        delta = solve(matrix, -vector, args, linstatus, args.linsolver)
        if getattr(args, "linsolver_verbose", 0):
            printlog(linstatus)
        packed = np.asarray(domain.pack_state(state))
        domain.unpack_state(domain.mod.cast(packed + delta, domain.dtype), state)
        if callback:
            pinfo = eval_pinfo(state)
            pinfo["linsolver"] = linstatus
            callback(state, epoch + 1, pinfo)
    arrays = domain.arrays_from_state(state)
    optinfo = argparse.Namespace(epochs=args.epochs, evals=opt.evals)
    return arrays, optinfo


def optimize(args, optname, problem, state, callback=None, **kwargs):
    if optname == "newton":
        return optimize_newton(args, problem, state, callback, **kwargs)
    if optname in ("gn", "newton_mf"):
        from .newton import optimize_gauss_newton

        return optimize_gauss_newton(args, problem, state, callback, **kwargs)
    return optimize_grad(args, optname, problem, state, callback, **kwargs)


# ---------------------------------------------------------------------------
# Environment / output dir.
# ---------------------------------------------------------------------------


def get_memory_usage_kb():
    try:
        import psutil

        return psutil.Process().memory_info().rss // 1024
    except ImportError:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return 0


def get_device_memory_usage_kb():
    """(bytes_in_use, pool_bytes) of device 0 in KiB; zeros if unavailable."""
    from . import runtime

    if runtime.jax is None:
        return 0, 0
    try:
        stats = runtime.jax.devices()[0].memory_stats() or {}
        return stats.get("bytes_in_use", 0) // 1024, stats.get("pool_bytes", 0) // 1024
    except Exception:
        return 0, 0


# Backwards-compatible alias (reference name).
get_gpu_memory_usage_kb = get_device_memory_usage_kb


def get_env_config():
    keys = ["ODIL_WARN", "ODIL_BACKEND", "ODIL_JIT", "ODIL_DTYPE", "JAX_PLATFORMS", "XLA_FLAGS"]
    return {k: os.environ.get(k, "") for k in keys}


def setup_outdir(args, relpath_args=None):
    """Creates the output dir, writes args.json, chdirs, opens train.log,
    rescales *_every by every_factor, and seeds the RNGs."""
    from . import runtime

    outdir = args.outdir
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "args.json"), "w") as f:
        record = dict(
            vars(args),
            **get_env_config(),
            runtime_backend=runtime.backend_name,
            runtime_dtype=runtime.dtype_name,
            runtime_jit=runtime.enable_jit,
        )
        json.dump(record, f, sort_keys=True, indent=4, default=str)

    os.chdir(outdir)
    set_log_file(open("train.log", "w"), echo=args.echo)

    for k in relpath_args or []:
        if getattr(args, k, None):
            setattr(args, k, os.path.relpath(getattr(args, k), start=outdir))

    def scaled(v):
        # 0 means "disabled" (as in the cadence gates); only scale active ones.
        if not v:
            return v
        return max(1, round(v * args.every_factor))

    args.plot_every = scaled(args.plot_every)
    args.history_every = scaled(args.history_every)
    args.report_every = scaled(args.report_every)
    if args.epochs is None:
        args.epochs = args.frames * args.plot_every

    if args.seed is not None:
        np.random.seed(args.seed)
        runtime.mod.random.set_seed(args.seed)
    printlog(" ".join(sys.argv))


# ---------------------------------------------------------------------------
# Callback engine.
# ---------------------------------------------------------------------------


def make_callback(
    problem,
    args=None,
    epoch_func=None,
    report_func=None,
    history_func=None,
    checkpoint_func=None,
    plot_func=None,
):
    """Builds the periodic callback: report / history / plot / checkpoint
    gated by the *_every cadences (reference ``util.py:337-467``)."""
    cbinfo = argparse.Namespace()
    cbinfo.walltime = 0
    cbinfo.epoch = 0
    cbinfo.time_callback = 0
    cbinfo.time_start = time.time()
    cbinfo.problem = problem
    cbinfo.args = args
    cbinfo.frame = getattr(args, "frame_start", 0) or 0
    cbinfo.history = History(csvpath="train.csv", warmup=1) if args.history_every else None
    cbinfo.orbax = None  # Lazily-created AsyncCheckpointer (--checkpoint_format orbax).

    def callback(state, epoch, pinfo):
        problem = cbinfo.problem
        domain = problem.domain
        args = cbinfo.args
        history = cbinfo.history
        time_prev = time.time()

        cbinfo.task_report = args.report_every and epoch % args.report_every == 0
        cbinfo.task_history = history is not None and (
            epoch % args.history_every == 0 or epoch < args.history_full
        )
        cbinfo.task_plot = args.plot_every and epoch % args.plot_every == 0 and (epoch or args.frames)
        cbinfo.task_checkpoint = args.checkpoint_every and epoch % args.checkpoint_every == 0
        cbinfo.pinfo = pinfo

        # Keep the host-visible tracer in sync for host-driven paths
        # (Newton, eval_operator); the device loop manages its own epoch.
        if isinstance(problem.tracers, dict):
            problem.tracers["epoch"] = epoch
        if epoch_func is not None:
            epoch_func(problem, state, epoch, cbinfo)

        curtime = time.time()
        cbinfo.time_callback += curtime - time_prev
        time_prev = curtime
        walltime = curtime - cbinfo.time_start - cbinfo.time_callback

        if cbinfo.task_report:
            printlog(f"\nepoch={epoch:05d}")
            if pinfo and "norms" in pinfo:
                norms, names = pinfo["norms"], pinfo["names"]
                printlog(
                    "residual: "
                    + ", ".join(
                        "{}:{:.5g}".format(name or str(i), np.asarray(norm))
                        for i, (norm, name) in enumerate(zip(norms, names))
                    )
                )
            if report_func is not None:
                report_func(problem, state, epoch, cbinfo)
            cpu_used = get_memory_usage_kb()
            dev_used, dev_pool = get_device_memory_usage_kb()
            printlog(
                f"memory: {cpu_used // 1024} MiB, device_used: {dev_used // 1024} MiB, "
                f"device_pool: {dev_pool // 1024} MiB"
            )
            if epoch > cbinfo.epoch:
                wte = (walltime - cbinfo.walltime) / (epoch - cbinfo.epoch)
                thr = math.prod(domain.cshape) / wte if wte > 0 else 0
            else:
                wte, thr = 0, 0
            printlog(
                f"walltime: {walltime:.3f} s"
                + f", walltime+callback: {walltime + cbinfo.time_callback:.3f} s"
                + f", walltime/epoch: {wte * 1000:.3f} ms"
            )
            printlog(f"throughput: {thr / 1e6:.3f} Mcells/s")
            cbinfo.walltime = walltime
            cbinfo.epoch = epoch

        if cbinfo.task_history:
            cpu_used = get_memory_usage_kb()
            dev_used, dev_pool = get_device_memory_usage_kb()
            history.append("epoch", epoch)
            history.append("frame", cbinfo.frame)
            if pinfo and "norms" in pinfo:
                for i, (norm, name) in enumerate(zip(pinfo["norms"], pinfo["names"])):
                    history.append("norm_{}".format(name or str(i)), np.asarray(norm))
            if pinfo and "loss" in pinfo:
                history.append("loss", float(pinfo["loss"]))
            if getattr(args, "linsolver_history", 0) and "linsolver" in pinfo:
                for key, val in pinfo["linsolver"].items():
                    if isinstance(val, (int, float, str, np.floating)):
                        history.append("lin_" + key, val)
            history.append("walltime", np.round(walltime, 3))
            history.append("memory", cpu_used // 1024)
            history.append("gpu_used", dev_used // 1024)
            history.append("gpu_pool", dev_pool // 1024)
            if history_func is not None:
                history_func(problem, state, epoch, history, cbinfo)
            history.write()

        if cbinfo.task_plot:
            if plot_func is not None:
                plot_func(problem, state, epoch, cbinfo.frame, cbinfo)
            cbinfo.frame += 1

        if cbinfo.task_checkpoint:
            if checkpoint_func is not None:
                checkpoint_func(problem, state, epoch, cbinfo)
            else:
                opt = getattr(problem, "_active_optimizer", None)
                optstate = getattr(opt, "slots", None) if opt is not None else None
                if getattr(args, "checkpoint_format", "pickle") == "orbax":
                    if cbinfo.orbax is None:
                        import atexit

                        from .checkpoint import AsyncCheckpointer

                        cbinfo.orbax = AsyncCheckpointer("checkpoint_orbax")
                        atexit.register(cbinfo.orbax.close)
                    printlog(f"checkpoint_orbax/{epoch}")
                    cbinfo.orbax.save(problem.domain, state, epoch, optstate=optstate)
                else:
                    from .checkpoint import checkpoint_save

                    path = f"checkpoint_{epoch:06d}.pickle"
                    printlog(path)
                    checkpoint_save(problem.domain, state, path, optstate=optstate)

        cbinfo.time_callback += time.time() - time_prev

    callback.cbinfo = cbinfo
    callback.every_epoch = epoch_func is not None
    return callback
