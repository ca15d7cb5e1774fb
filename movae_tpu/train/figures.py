"""Sample / reconstruction figure writers.

Equivalent of the reference figure writers (/root/reference/main.py:511-656):
per-epoch random-sample grids and original-vs-reconstruction panels saved as
PDFs under ``<save_root>/figures/{generated,reconstructed}/`` and logged to
the experiment logger as images.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# The reference styles all figures with scienceplots (main.py:37,51:
# plt.style.use(["science", "ieee", "no-latex"])). Use it when installed;
# otherwise approximate the IEEE look (serif type, no grid) so panels match.
try:  # pragma: no cover - depends on optional package
    import scienceplots  # noqa: F401

    plt.style.use(["science", "ieee", "no-latex"])
except Exception:  # pragma: no cover
    plt.rcParams.update({"font.family": "serif", "axes.grid": False,
                         "figure.dpi": 100})


def _to_display(img: np.ndarray, normalized: bool) -> np.ndarray:
    """Map model output range to [0,1] for display (denorm when inputs were
    normalized to [-1,1]; main.py value-range handling)."""
    img = np.asarray(img, np.float32)
    if normalized or img.min() < -0.01:
        img = img * 0.5 + 0.5
    return np.clip(img, 0.0, 1.0)


def _save_fig(fig, path: str) -> str:
    """Write the PDF + a PNG twin (quick viewing / logger upload); returns
    the PNG path."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    png = os.path.splitext(path)[0] + ".png"
    fig.savefig(png, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return png


def save_sample_grid(images: np.ndarray, path: str, normalized: bool = False,
                     ncols: Optional[int] = None, titles=None):
    """Save an image grid (NHWC) as a PDF (+PNG twin for quick viewing)."""
    n = len(images)
    ncols = ncols or int(np.ceil(np.sqrt(n)))
    nrows = int(np.ceil(n / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(2 * ncols, 2 * nrows))
    axes = np.atleast_1d(axes).reshape(-1)
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            ax.imshow(_to_display(images[i], normalized))
            if titles is not None and i < len(titles):
                ax.set_title(titles[i], fontsize=6)
    fig.tight_layout()
    return _save_fig(fig, path)


def save_reconstruction_panel(originals: np.ndarray, recons: np.ndarray,
                              path: str, normalized: bool = False):
    """Two-row panel: originals on top, reconstructions below
    (generate_reconstructed_samples, main.py:557-656)."""
    n = len(originals)
    # squeeze=False keeps the (2, n) grid shape even at n == 1
    # (np.atleast_2d would turn the squeezed (2,) vector into (1, 2))
    fig, axes = plt.subplots(2, n, figsize=(2 * n, 4.2), squeeze=False)
    for i in range(n):
        axes[0, i].imshow(_to_display(originals[i], normalized))
        axes[0, i].axis("off")
        axes[1, i].imshow(_to_display(recons[i], normalized))
        axes[1, i].axis("off")
    axes[0, 0].set_title("original", fontsize=8, loc="left")
    axes[1, 0].set_title("reconstruction", fontsize=8, loc="left")
    fig.tight_layout()
    return _save_fig(fig, path)
