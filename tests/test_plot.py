"""Plot module smoke tests: figures render and save for both entry points."""

import os

import numpy as np

import odil_tpu as odil


def test_plot_1d(tmp_path):
    domain = odil.Domain(cshape=(16, 16), dimnames=["t", "x"])
    u = np.random.rand(16, 16)
    path = str(tmp_path / "u.png")
    from odil_tpu.plot import plot_1d

    plot_1d(domain, u, u * 0.5, path=path, transpose=True, nslices=3, cmap="yellow")
    assert os.path.getsize(path) > 0


def test_plot_1d_returns_figure_without_path():
    domain = odil.Domain(cshape=(8, 8), dimnames=["t", "x"])
    u = np.random.rand(8, 8)
    from odil_tpu.plot import plot_1d

    fig = plot_1d(domain, u, u, nslices=2)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_2d(tmp_path):
    domain = odil.Domain(cshape=(4, 8, 8), dimnames=["t", "x", "y"])
    uu = np.random.rand(5, 8, 8)
    path = str(tmp_path / "u2.png")
    from odil_tpu.plot import plot_2d

    slices_it = np.array([0, 2, 4])
    slices_t = np.array([0.0, 0.5, 1.0])
    plot_2d(domain, uu, uu, slices_it, slices_t, path, cmap="rainbow")
    assert os.path.getsize(path) > 0


def test_savefig_extensions(tmp_path):
    import matplotlib.pyplot as plt

    from odil_tpu import plotutil

    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1], label="line")
    plotutil.savefig(fig, str(tmp_path / "fig"), extlist=["png", "svg"])
    assert (tmp_path / "fig.png").exists()
    assert (tmp_path / "fig.svg").exists()
    plt.close(fig)
