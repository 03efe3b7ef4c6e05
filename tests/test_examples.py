"""Smoke tests: every example workload builds its problem and trains a few
epochs with decreasing loss."""

import importlib
import os
import sys
import tempfile

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    ("poisson", "poisson", ["--N", "16", "--epochs", "60"]),
    ("heat", "heat", ["--Nt", "16", "--Nx", "16", "--epochs", "40", "--infer_k", "1", "--imposed", "random", "--nimp", "20"]),
    ("wave", "wave", ["--Nt", "16", "--Nx", "16", "--epochs", "40"]),
    ("heat_tmax", "heat_tmax", ["--Nt", "16", "--Nx", "16", "--epochs", "60"]),
    ("infer_constant", "infer_constant", ["--Nt", "16", "--Nx", "16", "--epochs", "60"]),
    ("velocity_from_tracer", "veltracer", ["--Nx", "16", "--epochs", "40"]),
    ("basic", "fields", ["--epochs", "60"]),
]

PINN_CASE = (
    "heat",
    "heat",
    ["--Nt", "16", "--Nx", "16", "--epochs", "40", "--solver", "pinn", "--Nci", "128",
     "--Ncb", "16", "--infer_k", "1", "--imposed", "random", "--nimp", "16"],
)

COMMON = ["--report_every", "1000000", "--history_every", "20", "--plot_every", "1000000", "--frames", "0", "--echo", "0"]


def run_example(subdir, module_name, argv):
    path = os.path.join(ROOT, "examples", subdir)
    sys.path.insert(0, path)
    cwd = os.getcwd()
    try:
        module = importlib.import_module(module_name)
        out = tempfile.mkdtemp()
        problem, state = module.main(argv + COMMON + ["--outdir", out])
        return problem, state, out
    finally:
        os.chdir(cwd)
        sys.path.remove(path)


@pytest.mark.parametrize("subdir,module_name,argv", CASES, ids=[c[1] for c in CASES])
def test_example_trains(subdir, module_name, argv):
    problem, state, out = run_example(subdir, module_name, argv)
    # Loss must decrease from the start of training.
    csv = os.path.join(out, "train.csv")
    assert os.path.isfile(csv)
    with open(csv) as f:
        header = f.readline().strip().split(",")
        rows = [line.strip().split(",") for line in f if line.strip()]
    icol = header.index("loss")
    losses = [float(r[icol]) for r in rows]
    assert len(losses) >= 2
    assert losses[-1] < losses[0], f"loss did not decrease: {losses[0]} -> {losses[-1]}"
    assert np.isfinite(losses[-1])


def test_heat_pinn_trains():
    problem, state, out = run_example(PINN_CASE[0], PINN_CASE[1], PINN_CASE[2])
    csv = os.path.join(out, "train.csv")
    with open(csv) as f:
        header = f.readline().strip().split(",")
        rows = [line.strip().split(",") for line in f if line.strip()]
    icol = header.index("loss")
    losses = [float(r[icol]) for r in rows]
    assert losses[-1] < losses[0]


def test_compare_pedagogy():
    """examples/compare.py (framework-free Van der Pol): global Newton and
    matrix-free GN must reproduce the Euler trajectory (the script asserts
    and prints PASS).  Previously broken: its defaults had drifted to a
    horizon where undamped global Newton diverges."""
    import runpy

    cwd = os.getcwd()
    argv = sys.argv
    try:
        sys.argv = ["compare.py", "--n", "25", "--tmax", "2.5"]
        runpy.run_path(os.path.join(ROOT, "examples", "compare.py"), run_name="__main__")
    finally:
        os.chdir(cwd)
        sys.argv = argv


@pytest.mark.skipif(
    __import__("jax").device_count() < 8, reason="needs 8 devices"
)
@pytest.mark.parametrize("kernel,halo,mesh", [
    ("xla", 1, "t:2,x:2,y:2"),
    ("pallas", 1, "t:2,x:4"),  # kernel halo: lane axis must stay unpartitioned
    ("pallas", 0, "t:2,x:2,y:2"),
])
def test_veltracer_cli_mesh_and_halo(kernel, halo, mesh):
    """The flagship CLI with --mesh/--halo: sharded training (GSPMD and the
    explicit shard_map halo-exchange path, XLA and fused-kernel operators)
    runs through the full harness on the 8-device CPU mesh, loss
    decreasing -- the exact flags a multi-chip production run uses."""
    problem, state, out = run_example(
        "velocity_from_tracer",
        "veltracer",
        ["--Nx", "16", "--epochs", "40", "--kernel", kernel,
         "--mesh", mesh, "--halo", str(halo)],
    )
    csv = os.path.join(out, "train.csv")
    with open(csv) as f:
        header = f.readline().strip().split(",")
        rows = [line.strip().split(",") for line in f if line.strip()]
    icol = header.index("loss")
    losses = [float(r[icol]) for r in rows]
    assert len(losses) >= 2
    assert losses[-1] < losses[0], f"loss did not decrease: {losses[0]} -> {losses[-1]}"
