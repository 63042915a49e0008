"""Matplotlib -> CHW image buffers for tensorboard logging.

Parity target: `/root/reference/pytorch_sound/utils/plots.py`.
"""

import matplotlib

matplotlib.use('Agg')

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _fig_to_chw(fig) -> np.ndarray:
    fig.canvas.draw()
    im = np.asarray(fig.canvas.buffer_rgba())
    plt.clf()
    plt.close('all')
    return np.rollaxis(im[..., :3], 2)


def plot_to_buf(x: np.ndarray, align: bool = True) -> np.ndarray:
    """Line-plot an array into a CHW uint8 image (y limits [-1, 1] if ``align``)."""
    x = np.asarray(x)
    fig, ax = plt.subplots()
    ax.plot(x)
    if align:
        ax.set_ylim([-1, 1])
    return _fig_to_chw(fig)


def imshow_to_buf(x: np.ndarray) -> np.ndarray:
    """Render a 2d array (or first channel of a 3d one) into a CHW uint8 image."""
    x = np.asarray(x)
    if x.ndim == 3:
        x = x[0]
    fig, ax = plt.subplots()
    ax.imshow(x, aspect='auto')
    return _fig_to_chw(fig)
