"""Plotting smoke tests (the reference keeps a matplotlib sanity test,
test/test_pyplot.py; here the full composite view is rendered to a buffer)."""
import numpy as np
import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402

from nfopp_tpu.plotting import plot_collision_positions, plot_planner_data  # noqa: E402


def test_plot_planner_data_renders():
    fig = plt.figure()
    path = np.stack(
        [np.linspace(0, 3, 30), np.linspace(0, 2, 30), np.zeros(30)], axis=1
    )
    obstacles = np.random.RandomState(0).uniform(0, 3, (10, 2))

    def fake_field(queries):
        return (queries[:, :1] - 1.5) * 2.0

    ax = plot_planner_data(path, fake_field, (0, 3, 0, 3), obstacles)
    assert ax is not None
    fig.canvas.draw()
    plt.close(fig)


def test_plot_collision_positions():
    fig = plt.figure()
    positions = np.random.RandomState(1).uniform(0, 3, (20, 2))
    truth = np.random.RandomState(2).rand(20) > 0.5
    plot_collision_positions(positions, truth)
    fig.canvas.draw()
    plt.close(fig)
