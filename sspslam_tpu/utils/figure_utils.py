"""Figure styling and saving helpers (parity with reference
utils/figure_utils.py: Tango palette, circle patches, cropped-PDF save —
the Ghostscript crop pipeline degrades gracefully when gs is absent)."""

from __future__ import annotations

import os
import subprocess

import numpy as np

# Tango colour scheme
blues = ["#729fcf", "#3465a4", "#204a87"]
greens = ["#8ae234", "#73d216", "#4e9a06"]
reds = ["#ef2929", "#cc0000", "#a40000"]
oranges = ["#fcaf3e", "#f57900", "#ce5c00"]
purples = ["#ad7fa8", "#75507b", "#5c3566"]
yellows = ["#fce94f", "#edd400", "#c4a000"]
browns = ["#e9b96e", "#c17d11", "#8f5902"]
greys = ["#eeeeec", "#d3d7cf", "#babdb6", "#888a85", "#555753", "#2e3436"]
palette = [blues[1], oranges[1], greens[2], reds[1], purples[1],
           browns[1], yellows[2], greys[3]]


def circles(x, y, s, c="b", vmin=None, vmax=None, ax=None, **kwargs):
    """Scatter of true-radius circles (data units), like the reference's
    ``circles`` helper (figure_utils.py:44-77)."""
    import matplotlib.pyplot as plt
    from matplotlib.collections import PatchCollection
    from matplotlib.patches import Circle

    if ax is None:
        ax = plt.gca()
    if np.isscalar(c):
        kwargs.setdefault("color", c)
        c = None
    zipped = np.broadcast(x, y, s)
    patches = [Circle((x_, y_), s_) for x_, y_, s_ in zipped]
    collection = PatchCollection(patches, **kwargs)
    if c is not None:
        collection.set_array(np.asarray(c))
        collection.set_clim(vmin, vmax)
    ax.add_collection(collection)
    ax.autoscale_view()
    return collection


def save(fig, filename, fig_width=None, fig_height=None, dpi=300, **kwargs):
    """Save a figure; PDF outputs are crop/compressed through Ghostscript
    when available, otherwise saved directly with tight bounding box."""
    if fig_width is not None:
        h = fig_height or fig_width / 1.618
        fig.set_size_inches(fig_width, h)
    base, ext = os.path.splitext(filename)
    fig.savefig(filename, dpi=dpi, bbox_inches="tight", **kwargs)
    if ext.lower() == ".pdf":
        try:
            tmp = base + "_crop.pdf"
            subprocess.run(
                ["gs", "-sDEVICE=pdfwrite", "-dCompatibilityLevel=1.4",
                 "-dPDFSETTINGS=/ebook", "-dNOPAUSE", "-dQUIET", "-dBATCH",
                 f"-sOutputFile={tmp}", filename],
                check=True, capture_output=True)
            os.replace(tmp, filename)
        except (OSError, subprocess.CalledProcessError):
            pass  # ghostscript unavailable; keep the direct save
    return filename
